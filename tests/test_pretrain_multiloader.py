"""Pre-training multi-dataset path: list-valued data_loader config, zip of
alternating batches, max_samples_per_epoch cap (reference
trainer/trainer_dist.py:125-129, configs/pt/*.json)."""
import numpy as np
import pytest

from demovlp_tpu.config import ConfigParser
from demovlp_tpu.cli.common import init_dataloaders
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.datasets import dataset_object_loader


def _loader_section(n, bs):
    return {
        "type": "MultiDistTextObjectVideoDataLoader",
        "args": {
            "dataset_name": "SyntheticObjectSelect",
            "data_dir": "",
            "object_dir": "",
            "split": "train",
            "shuffle": True,
            "batch_size": bs,
            "num_workers": 1,
            "text_params": {},
            "object_params": {
                "object_num": 2, "num_frames": 1, "num_samples": n,
            },
        },
    }


def test_init_dataloaders_list_config(tmp_path):
    config = ConfigParser(
        config={
            "name": "pt-double",
            "data_loader": [_loader_section(32, 4), _loader_section(48, 4)],
            "trainer": {"save_dir": str(tmp_path)},
        },
        test=True,
        timestamp=False,
    )
    train_loaders, val_loaders = init_dataloaders(config, val_split="val")
    assert len(train_loaders) == 2 and len(val_loaders) == 2
    assert train_loaders[0].n_samples == 32
    assert train_loaders[1].n_samples == 48
    # val loaders don't shuffle
    assert val_loaders[0].shuffle is False


def test_zip_alternates_and_caps():
    def make(n, bs):
        ds = dataset_object_loader(
            "SyntheticObjectSelect",
            text_params={},
            object_params={"object_num": 2, "num_frames": 1, "num_samples": n},
            split="train",
        )
        return RegionDataLoader(ds, batch_size=bs, shuffle=True, num_workers=1,
                                process_index=0, process_count=1)

    la, lb = make(32, 4), make(48, 4)
    total_batch_sum = la.batch_size + lb.batch_size
    max_samples = 40
    steps = 0
    for batch_idx, (a, b) in enumerate(zip(la, lb)):
        if (batch_idx + 1) * total_batch_sum > max_samples:
            break
        assert a["object"].shape[0] == 4 and b["object"].shape[0] == 4
        steps += 1
    # cap: floor(40 / 8) = 5 joint steps
    assert steps == 5
