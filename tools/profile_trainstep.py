"""Break the train step into components and time each on the real chip.

Components (b32, flagship shapes):
  fwd        — model forward 3000→16384
  fwd+bwd    — model forward + backward via a trivial loss (no point-op losses)
  cd34 f     — chamfer_means(gt,out3)+(gt,out4) forward (sorted-space path)
  cd34 f+b   — value+grad of the same wrt out3/out4
  emd f+b    — earth_mover(gt1,p1)+(gt2,p2) value+grad (64² + 1024² full path)
  recd f+b   — re_chamfer(gt,out3) value+grad (batched 8-slice fold)
  fps        — gt pyramid FPS 64+1024 of 16384
  step       — the full fused train step (reference composition)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu import losses
from rfnet_tpu.models import RFNet
from rfnet_tpu.ops.chamfer import chamfer_means, chamfer_means_pair
from rfnet_tpu.ops.fps import farthest_point_sample, gather_point
from rfnet_tpu.train import TrainConfig, create_state

ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    for _ in range(2):
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:12s}: {ms:8.2f} ms")
    return ms


def main():
    config = TrainConfig()
    state = create_state(config, RFNet())
    b = 32
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(b, config.innum, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    gt1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    gt2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))
    out3 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    out4 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    p1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))

    fwd = jax.jit(lambda p, x: state.apply_fn(p, x).out4)
    timeit("fwd", fwd, state.params, partial)

    @jax.jit
    def fwd_bwd(p, x):
        return jax.grad(lambda pp: jnp.sum(state.apply_fn(pp, x).out4 ** 2))(p)

    timeit("fwd+bwd", fwd_bwd, state.params, partial)

    @jax.jit
    def cd34_f(gt, o3, o4):
        a, b_, c, d = chamfer_means_pair(gt, o3, o4)
        return a + b_ + c + d

    timeit("cd34 fwd", cd34_f, gt, out3, out4)

    @jax.jit
    def cd34_f_unfused(gt, o3, o4):
        a = chamfer_means(gt, o3)
        c = chamfer_means(gt, o4)
        return a[0] + a[1] + c[0] + c[1]

    timeit("cd34 f unfus", cd34_f_unfused, gt, out3, out4)

    @jax.jit
    def cd34_fb_unfused(gt, o3, o4):
        return jax.grad(lambda a, c: cd34_f_unfused(gt, a, c), argnums=(0, 1))(o3, o4)

    timeit("cd34 fb unfus", cd34_fb_unfused, gt, out3, out4)

    @jax.jit
    def cd34_fb(gt, o3, o4):
        return jax.grad(lambda a, c: cd34_f(gt, a, c), argnums=(0, 1))(o3, o4)

    timeit("cd34 fwd+bwd", cd34_fb, gt, out3, out4)

    @jax.jit
    def emd_fb(g1, g2, a, c):
        f = lambda a, c: losses.earth_mover(g1, a) + losses.earth_mover(g2, c)
        return jax.grad(f, argnums=(0, 1))(a, c)

    timeit("emd fwd+bwd", emd_fb, gt1, gt2, p1, p2)

    # split: cd1 (64²) vs cd2 (1024²) — the VERDICT r2 #4 decision input
    @jax.jit
    def emd64_fb(g1, a):
        return jax.grad(lambda aa: losses.earth_mover(g1, aa))(a)

    timeit("emd64 f+b", emd64_fb, gt1, p1)

    @jax.jit
    def emd1024_fb(g2, c):
        return jax.grad(lambda cc: losses.earth_mover(g2, cc))(c)

    timeit("emd1024 f+b", emd1024_fb, gt2, p2)

    @jax.jit
    def recd_fb(gt, o3):
        return jax.grad(lambda a: losses.re_chamfer(gt, a, part=8))(o3)

    timeit("recd fwd+bwd", recd_fb, gt, out3)

    @jax.jit
    def fps_pyr(gt):
        i1 = farthest_point_sample(64, gt)
        i2 = farthest_point_sample(1024, gt)
        return gather_point(gt, i1), gather_point(gt, i2)

    timeit("fps pyramids", fps_pyr, gt)

    # jit WITHOUT donation (make_jitted_steps donates the state arg, which
    # would invalidate `state` after the first timed call)
    import functools

    from rfnet_tpu.train import train_step

    jstep = jax.jit(functools.partial(train_step, n1=64, n2=1024))

    def step_fn(s, x, g):
        s2, lb, _ = jstep(s, x, g)
        return lb.total

    timeit("full step", step_fn, state, partial, gt)


if __name__ == "__main__":
    main()
