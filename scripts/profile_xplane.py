"""Per-op DEVICE-TIME profile of the pre-train step via jax.profiler.

Complements scripts/profile_step.py (which ablates the real donating step —
reliable on the remote axon backend where isolated-jit timing mis-times):
this one records an xplane trace and parses the raw proto directly (no
tensorboard UI), printing ms/step and % per XLA op on every device plane.
Requires the backend to emit device planes (works on CPU always; TPU
support depends on the runtime). PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION is
forced to python because the installed tensorboard_plugin_profile gencode
predates protobuf 4."""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# make `python scripts/profile_xplane.py` work from anywhere WITHOUT
# PYTHONPATH=<repo>: sys.path[0] is scripts/, so the package import below
# needs the repo root appended. (Appended, not env: in this environment a
# PYTHONPATH entry at interpreter start breaks the TPU plugin's platform
# registration — 'axon' vanishes from jax's known backends.)
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()
import jax

# the environment's sitecustomize can pre-select a hardware platform over
# JAX_PLATFORMS; an explicit config.update before first backend use wins
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train import make_optimizer
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import make_retrieval_train_step
    from demovlp_tpu.utils.cache import enable_compile_cache
    from demovlp_tpu.utils.prng import fast_prng_key
    import jax.numpy as jnp

    enable_compile_cache()
    b = int(os.environ.get("PROF_BATCH", 128))
    f = int(os.environ.get("PROF_FRAMES", 1))
    k = int(os.environ.get("PROF_REGIONS", 30))
    text_len = int(os.environ.get("PROF_TEXT_LEN", 100))
    depth = int(os.environ.get("PROF_OBJ_DEPTH", 12))
    layers = int(os.environ.get("PROF_TEXT_LAYERS", 6))
    mesh = create_mesh()
    model = ObjectRelation(
        object_num=k, num_frames=f, dtype=jnp.bfloat16, object_depth=depth,
        text_config=DistilBertConfig(n_layers=layers),
    )
    rng = jax.random.PRNGKey(0)
    step_rng = fast_prng_key(0)
    gen = np.random.RandomState(0)
    batch = {
        "input_ids": gen.randint(1, 30000, size=(b, text_len)).astype(np.int32),
        "attention_mask": np.ones((b, text_len), np.int32),
        "object": gen.randn(b, f, k, 2054).astype(np.float32),
        "object_mask": np.ones((b, f, k), np.float32),
    }
    params = model.init(rng, batch)
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal", local_dtype="bfloat16")
    tx = make_optimizer(lr=1e-5)
    state = TrainState.create(params, tx)
    step = make_retrieval_train_step(model, loss, tx, mesh)
    sb = shard_batch(batch, mesh)
    state, m = step(state, sb, 1e-5, step_rng)
    state, m = step(state, sb, 1e-5, step_rng)
    float(m["loss"])

    logdir = os.environ.get("PROF_TRACE_DIR", "/tmp/jaxtrace")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, m = step(state, sb, 1e-5, step_rng)
        float(m["loss"])

    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    print("xplane files (oldest->newest):", files)
    if not files:
        return
    # Parse raw xplane proto: sum durations per event name on device planes
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    names = [p.name for p in xs.planes]
    print("planes:", names)
    for plane in xs.planes:
        # device planes hold per-op XLA events; host planes hold runtime noise
        is_dev = (
            any(t in plane.name for t in ("TPU", "GPU", "/device:"))
            or plane.name == "/host:CPU"  # XLA:CPU op events
        )
        if not is_dev and len(xs.planes) > 1:
            continue
        ev_meta = {m_.id: m_.name for m_ in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0) + ev.duration_ps
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
        print(f"== plane: {plane.name}")
        tot = sum(totals.values())
        for name, ps in top:
            print(f"  {ps/1e9/3:9.3f} ms/step  {100*ps/tot:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
