"""On-chip A/B: z-slab early-exit kernel vs 3D best-first AABB-tile kernel.

Times the one-sided NN pair (out→gt + gt→out, presorted in each kernel's own
key order, b32 16384²) on three data regimes:

  * random uniform clouds (the regime the z-slab kernel was tuned on),
  * real UNTRAINED model outputs vs synthetic gt — the early-training regime
    where cd34 f+b measured 118 ms vs 65 random (tools/profile_loss_ablate.py),
  * a compact blob query inside a spread target (worst case for 1D z pruning).

Sort costs are excluded on purpose: both paths pay one variadic sort per
cloud (z key vs Morton key — same op), so kernel time is the whole diff.
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu.models import RFNet
from rfnet_tpu.ops.chamfer import _zsort
from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas
from rfnet_tpu.ops.pallas.chamfer_tile import nn_tile_pallas, sort_by_morton_with_order
from rfnet_tpu.train import TrainConfig, create_state

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=44)


def main():
    config = TrainConfig()
    state = create_state(config, RFNet())
    b = 32
    rng = np.random.RandomState(0)
    from rfnet_tpu.data.online import synthetic_batch

    partial, gt = synthetic_batch(jax.random.PRNGKey(7), b, config.innum, config.ptnum)
    out = jax.jit(state.apply_fn)(state.params, partial)
    o3 = jax.lax.stop_gradient(out.out3)
    rnd = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    blob = jnp.asarray((0.05 * rng.randn(b, config.ptnum, 3)).astype(np.float32))

    sortz = jax.jit(lambda x: _zsort(x)[0])
    sortm = jax.jit(lambda x: sort_by_morton_with_order(x)[0])
    data = {}
    for name, cloud in [("gt", gt), ("out3", o3), ("rand", rnd), ("blob", blob)]:
        data[name] = (sortz(cloud), sortm(cloud))
    jax.block_until_ready(jax.tree_util.tree_leaves(data))

    def pair_dyn(a, c):
        d1, _ = nn_dyn_pallas(a, c)
        d2, _ = nn_dyn_pallas(c, a)
        return jnp.sum(d1) + jnp.sum(d2)

    pair_dyn = jax.jit(pair_dyn)

    pairs = [("out3<->gt", "out3"), ("rand<->gt", "rand"), ("blob<->gt", "blob")]
    for label, key in pairs:
        timeit(f"dyn  z-slab      {label}", pair_dyn, data[key][0], data["gt"][0])

    for tile_m in (512, 256):
        for rounds in (2,):
            @jax.jit
            def pair_tile(a, c, tile_m=tile_m, rounds=rounds):
                d1, _ = nn_tile_pallas(a, c, tile_m=tile_m, rounds=rounds)
                d2, _ = nn_tile_pallas(c, a, tile_m=tile_m, rounds=rounds)
                return jnp.sum(d1) + jnp.sum(d2)

            for label, key in pairs:
                timeit(
                    f"tile 3D tm={tile_m} r={rounds} {label}",
                    pair_tile,
                    data[key][1],
                    data["gt"][1],
                )

    # exactness spot check on-chip: sums must agree between kernels
    for label, key in pairs:
        sd = float(pair_dyn(data[key][0], data["gt"][0]))
        st = float(jax.jit(lambda a, c: jnp.sum(nn_tile_pallas(a, c)[0]) + jnp.sum(nn_tile_pallas(c, a)[0]))(data[key][1], data["gt"][1]))
        print(f"sum check {label}: dyn={sd:.6f} tile={st:.6f} rel={abs(sd-st)/max(abs(sd),1e-9):.2e}", flush=True)


if __name__ == "__main__":
    main()
