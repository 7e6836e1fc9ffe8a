"""Stage-level timing of the flagship forward pass on the real chip.

Times each architectural stage in isolation (jitted separately) to find
where the per-batch milliseconds go. Methodology: dispatch N iterations,
force completion with a scalar readback of the last result.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu.models import RFNet
from rfnet_tpu.models.rfnet import merge_layer
from rfnet_tpu.ops.chamfer import nn_distance
from rfnet_tpu.ops.fps import farthest_point_sample
from rfnet_tpu.train import TrainConfig, create_state

B = 32
ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import sys

    config = TrainConfig()
    state = create_state(config, RFNet())
    if "--trained" in sys.argv:
        # converged weights change the merge layers' reroute traffic (and
        # nothing else in the forward is weight-data-dependent) — profile
        # both regimes when attributing headline deltas
        from bench import _load_trained

        state = _load_trained(state)
    model = RFNet()
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(B, 3000, 3).astype(np.float32))
    pts1 = jnp.asarray(rng.rand(B, 64, 3).astype(np.float32))
    pts2 = jnp.asarray(rng.rand(B, 1024, 3).astype(np.float32))
    pts3 = jnp.asarray(rng.rand(B, 16384, 3).astype(np.float32))
    code = jnp.asarray(rng.rand(B, 1, 256).astype(np.float32))
    st1 = jnp.asarray(rng.rand(B, 64, 128).astype(np.float32))
    st2 = jnp.asarray(rng.rand(B, 1024, 128).astype(np.float32))
    st3 = jnp.asarray(rng.rand(B, 16384, 128).astype(np.float32))
    decf = jnp.ones((1,), jnp.float32)

    del model
    total = timeit("FULL forward", jax.jit(lambda x: state.apply_fn(state.params, x).out4), pc)

    timeit("fps 32-of-3000", jax.jit(lambda x: farthest_point_sample(32, x)), pc)
    # step=0 picks the first per-step bias table (StepDense; the recurrent
    # kernels are shared, so stage cost is step-independent)
    timeit(
        "encode_cell @3000",
        jax.jit(lambda x, s: RFNet().bind(state.params).cell(x, s, 0)),
        pc, code,
    )
    timeit(
        "encode_cell @4024",
        jax.jit(lambda x, s: RFNet().bind(state.params).cell(x, s, 0)),
        jnp.concatenate([pc, pts2], axis=1), code,
    )
    timeit(
        "recover @3000",
        jax.jit(lambda c, x: RFNet().bind(state.params).recover1(c, x)), code, pc,
    )
    timeit(
        "decode 64->1024",
        jax.jit(lambda c, ce, s: RFNet().bind(state.params).decode(c, ce, s, 0)),
        code, pts1, st1,
    )
    timeit(
        "decode 1024->16384",
        jax.jit(lambda c, ce, s: RFNet().bind(state.params).decode(c, ce, s, 1)),
        code, pts2, st2,
    )
    timeit("merge @64", jax.jit(lambda a, b: merge_layer(a, b, decf)), pc, pts1)
    timeit("merge @1024", jax.jit(lambda a, b: merge_layer(a, b, decf)), pc, pts2)
    timeit("merge @16384", jax.jit(lambda a, b: merge_layer(a, b, decf)), pc, pts3)
    timeit(
        "refine @1024",
        jax.jit(lambda x, c, s: RFNet().bind(state.params).refine2(x, c, s)),
        pts2, code, st2,
    )
    timeit(
        "refine @16384",
        jax.jit(lambda x, c, s: RFNet().bind(state.params).refine_final(x, c, s)),
        pts3, code, st3,
    )
    timeit("nn_distance 3000v16384 both", jax.jit(nn_distance), pc, pts3)
    print(f"{'(full measured above)':34s} {total * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
