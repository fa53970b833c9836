from demovlp_tpu.utils.io import (
    read_json,
    write_json,
    load_json,
    save_json,
    load_jsonl,
    save_jsonl,
    merge_dicts,
    flat_list_of_lists,
    inf_loop,
    replace_nested_dict_item,
)
from demovlp_tpu.utils.logging import setup_logging, get_logger
from demovlp_tpu.utils.timer import Timer

__all__ = [
    "read_json",
    "write_json",
    "load_json",
    "save_json",
    "load_jsonl",
    "save_jsonl",
    "merge_dicts",
    "flat_list_of_lists",
    "inf_loop",
    "replace_nested_dict_item",
    "setup_logging",
    "get_logger",
    "Timer",
]
