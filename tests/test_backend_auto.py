"""Backend auto-resolution: on CPU, 'auto' must route to the XLA path (the
compiled Mosaic kernel can't run on the CPU backend)."""
import numpy as np

import jax
import jax.numpy as jnp

from demovlp_tpu.ops import xattn
from demovlp_tpu.parallel import create_mesh, sharded_local_sims


def test_xattn_auto_on_cpu_is_xla():
    xattn.set_backend("auto")
    try:
        rng = np.random.RandomState(0)
        im = jnp.array(rng.randn(4, 5, 8), jnp.float32)
        s = jnp.array(rng.randn(3, 4, 8), jnp.float32)
        imm = jnp.zeros((4, 5))
        sm = jnp.zeros((3, 4))
        out = xattn.xattn_score(im, s, imm, sm, 20.0, "equal")
        assert np.isfinite(np.asarray(out)).all()
    finally:
        xattn.set_backend("xla")


def test_sharded_auto_on_cpu():
    rng = np.random.RandomState(1)
    img = rng.randn(8, 5, 8).astype(np.float32)
    lang = rng.randn(4, 4, 8).astype(np.float32)
    imask = np.zeros((8, 5), np.float32)
    lmask = np.zeros((4, 4), np.float32)
    mesh = create_mesh()
    out = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=1, backend="auto",
        focal_type="equal",
    )
    assert out.shape == (8, 4)
    assert np.isfinite(out).all()
