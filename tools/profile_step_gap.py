"""Account for the train-step time NOT covered by tools/profile_trainstep.py.

profile_trainstep.py's pieces (fwd+bwd, cd34 f+b, emd f+b, recd f+b, fps)
summed to ~150 ms against a 202 ms full step (2026-08-17, b32) — this tool
times the remaining candidates so the gap is attributed, not guessed:

  losses f+b  — value+grad of losses.total_loss wrt ALL model outputs
                (the full loss stack incl. zgn / moveloss / decfactor,
                exactly as composed in the step)
  zgn pair f  — the two zero_groupnear hinges alone (16384->1024 and
                1024->64 dense NN scans; gradient-dead point args)
  adam        — state.apply_gradients with fabricated grads (3.8M params)
  diag        — the per-step code diagnostics block
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu import losses
from rfnet_tpu.models import RFNet
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
    print(f"{name:12s}: {ms:8.2f} ms", flush=True)
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

    # concrete outputs from one forward (reused as loss inputs)
    outputs = jax.jit(state.apply_fn)(state.params, partial)
    outputs = jax.tree_util.tree_map(jax.lax.stop_gradient, outputs)
    jax.block_until_ready(outputs)

    @jax.jit
    def losses_fb(outputs, gt, gt1, gt2):
        def f(o):
            return losses.total_loss(o, gt, gt1, gt2, 0, 1.0).total

        val, g = jax.value_and_grad(f)(outputs)
        return val, g.out3, g.out4

    timeit("losses f+b", losses_fb, outputs, gt, gt1, gt2)

    @jax.jit
    def zgn_pair(gt, gt1, gt2, m1, m2):
        return losses.zero_groupnear(gt1, gt2, m1) + losses.zero_groupnear(
            gt2, gt, m2
        )

    timeit("zgn pair f", zgn_pair, gt, gt1, gt2, outputs.moves1, outputs.moves2)

    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    @jax.jit
    def adam(state, grads):
        return state.apply_gradients(grads=grads).params

    timeit("adam", adam, state, grads)

    @jax.jit
    def diag(out):
        return {
            "code1_first": out.code1[0, 0, 0],
            "code1_nonzero": jnp.sum(out.code1[0, 0] != 0),
            "code2_nonzero": jnp.sum(out.code2[0, 0] != 0),
            "code3_nonzero": jnp.sum(out.code3[0, 0] != 0),
            "code1_max": jnp.max(out.code1[0, 0]),
            "code2_max": jnp.max(out.code2[0, 0]),
            "code3_max": jnp.max(out.code3[0, 0]),
        }

    timeit("diag", diag, outputs)


if __name__ == "__main__":
    main()
