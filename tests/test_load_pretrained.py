"""arch.args.load_checkpoint transfer loading through the CLI helper."""
import numpy as np

import jax

from demovlp_tpu.cli.common import load_pretrained_params
from demovlp_tpu.config import ConfigParser
from demovlp_tpu.train import TrainState, make_optimizer


def _state(seed):
    rng = np.random.RandomState(seed)
    import jax.numpy as jnp

    params = {"params": {"d": {"kernel": jnp.array(rng.randn(3, 2), jnp.float32)}}}
    return TrainState.create(params, make_optimizer(lr=1e-3))


def test_noop_without_checkpoint(tmp_path):
    config = ConfigParser(
        config={"name": "x", "arch": {"type": "ObjectRelation", "args": {}},
                "trainer": {"save_dir": str(tmp_path)}},
        test=True, timestamp=False,
    )
    state = _state(0)
    assert load_pretrained_params(config, state) is state


def test_orbax_dir_loading(tmp_path):
    import orbax.checkpoint as ocp

    donor = _state(1)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp_path / "conv" / "params").absolute(), donor.params)
    ckptr.wait_until_finished()

    config = ConfigParser(
        config={
            "name": "x",
            "arch": {"type": "ObjectRelation",
                     "args": {"load_checkpoint": str(tmp_path / "conv")}},
            "trainer": {"save_dir": str(tmp_path)},
        },
        test=True, timestamp=False,
    )
    state = _state(2)
    out = load_pretrained_params(config, state)
    np.testing.assert_array_equal(
        np.asarray(out.params["params"]["d"]["kernel"]),
        np.asarray(donor.params["params"]["d"]["kernel"]),
    )
    # optimizer state untouched (fresh)
    assert out.step == state.step
