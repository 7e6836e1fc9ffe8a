"""RFNet — Recurrent Forward Network for dense point-cloud completion.

A from-scratch flax re-design of the reference graph (`vv_recon.py:84-364`,
orchestrated by ``full_process`` `vv_recon.py:194-244`): 3 recurrent steps of
encode → decode/upsample ×16 → merge-with-input → refine, growing a partial
3000-point cloud into a 64 → 1024 → 16384-point completion pyramid.

Weight sharing reproduced exactly:
  * ``EncodeCell`` ('cell') is ONE module applied at every step
    (reference ``reuse=True`` at `vv_recon.py:217,229`) — but only the
    KERNELS are shared: ``tf.Variable`` biases ignore scope reuse, so each
    invocation trains its own bias set (the trained checkpoint's bias-only
    ``cell_1/ cell_2/`` scopes, `bestrecord/model-229999.index`). Modeled
    with :class:`~rfnet_tpu.nn.StepDense` per-step bias tables;
  * ``DecodeCell`` ('decode_cell') is ONE module applied at steps 2 and 3
    (`vv_recon.py:220,232`), same kernel-only sharing (checkpoint scope
    ``decode_cell_1/``);
  * the three ``RecoverCell``s / ``RefineLayer``s are per-step
    (`vv_recon.py:202,218,230` / `:214,226,239`);
  * residual codewords code2 = code1 + Δ, code3 = code2 + Δ
    (`vv_recon.py:219,231`).

TF collections become explicit structured outputs (:class:`RFNetOutputs`):
the loss needs the PRE-merge coarse pyramids ('points1'/'points2' are stashed
before merge+refine, `vv_recon.py:210,221`), the decode offsets
('decode_cell64'/'decode_cell1024', `vv_recon.py:345`), the final refine move
('refine_layer_final16384', `vv_recon.py:301`) and the squared decline
factors (`vv_recon.py:212,224,235`).

All tensors are channels-last (b, npts, c); the reference's dummy width-1
conv axis is dropped — every 1×1 conv is a Dense matmul on the MXU. The whole
3-step recurrence is one jittable function: fixed sizes (3000 in,
64/1024/16384 out) mean a single XLA compilation serves train and eval.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rfnet_tpu.nn import PointMLP, StepDense, dense
from rfnet_tpu.ops.chamfer import nearest_neighbor_coords
from rfnet_tpu.ops.fps import farthest_point_sample, gather_point

def _scalar_xavier(key, shape, dtype=jnp.float32):
    """TF xavier on shape [1]: uniform ±√(6/(1+1)) (`vv_recon.py:211`)."""
    lim = jnp.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -lim, lim)


_dense = dense
MLP = PointMLP


class GlobalMLP(nn.Module):
    """Per-point MLP + max-pool codeword (`global_mlp`, vv_recon.py:84-91)."""

    features: tuple = (64, 128, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, pts):
        t = MLP(self.features, name="mlp", dtype=self.dtype)(pts)
        return jnp.max(t, axis=1, keepdims=True)  # (b, 1, c)


class EncodeCell(nn.Module):
    """The shared RNN cell (`encode_cell`, vv_recon.py:93-111).

    (points (b,n,3), state (b,1,S)) -> (code (b,1,S), new_state (b,1,S)).

    Kernels are shared across the ``n_steps`` recurrent invocations; biases
    are per-step (``step`` = 0/1/2 ↔ checkpoint scopes cell/cell_1/cell_2 —
    see the module docstring and :class:`~rfnet_tpu.nn.StepDense`).
    """

    mlp: tuple = (256, 384)
    mlpout: tuple = (256, 256)
    state_len: int = 256
    n_steps: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, pts, state, step: int):
        n = pts.shape[1]
        x = jnp.concatenate([pts, jnp.broadcast_to(state, (pts.shape[0], n, state.shape[-1]))], -1)
        x = MLP(self.mlp, name="state_mlp", dtype=self.dtype, n_steps=self.n_steps)(x, step)
        x = nn.relu(StepDense(self.state_len, self.n_steps, name="state_end", dtype=self.dtype)(x, step))
        new_state = jnp.max(x, axis=1, keepdims=True)
        code = MLP(self.mlpout, name="code_mlp", dtype=self.dtype, n_steps=self.n_steps)(new_state, step)
        return code, new_state


class RecoverCell(nn.Module):
    """Re-attends the codeword to the point set (`recover_cell`,
    vv_recon.py:123-131). Final projection has no activation."""

    mlp2: tuple = (256, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, code, pts):
        b, n, _ = pts.shape
        x = jnp.concatenate([jnp.broadcast_to(code, (b, n, code.shape[-1])), pts], -1)
        x = MLP(self.mlp2, name="mlp", dtype=self.dtype)(x)
        x = jnp.max(x, axis=1, keepdims=True)
        return _dense(self.mlp2[-1], "out", self.dtype)(x)  # linear (b, 1, c)


class InitMoveLayer(nn.Module):
    """Moves FPS seed points by tanh-bounded offsets and emits their per-point
    state (`init_move_layer`, vv_recon.py:140-159)."""

    mlp: tuple = (256, 256, 256)
    mlp1: tuple = (256, 128)
    mlp2: tuple = (256, 128, 64)
    state_len: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, startpts, code):
        b, k, _ = startpts.shape
        t1 = jnp.concatenate(
            [startpts, jnp.broadcast_to(code, (b, k, code.shape[-1]))], -1
        )
        t = MLP(self.mlp, name="mlp", dtype=self.dtype)(t1)
        maxt = jnp.max(t, axis=1, keepdims=True)
        t = jnp.concatenate([t1, jnp.broadcast_to(maxt, (b, k, maxt.shape[-1]))], -1)
        feats = MLP(self.mlp1, name="featmlp", dtype=self.dtype)(t)
        feats = nn.relu(_dense(self.state_len, "featout", self.dtype)(feats))
        pts = MLP(self.mlp2, name="ptsmlp", dtype=self.dtype)(t)
        pts = jnp.tanh(_dense(3, "ptsout", self.dtype)(pts))
        return startpts + pts, feats


class InitDecodeLayer(nn.Module):
    """Generates ``ptnum`` fresh points from a code via a learned 3×3 linear
    map + translation (`init_decode_layer`, vv_recon.py:246-271)."""

    ptnum: int = 32
    mlp: tuple = (256, 256)
    mlp2: tuple = (256, 256)
    state_len: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, code):
        b = code.shape[0]
        x = nn.relu(_dense(256, "input_trans", self.dtype)(code))  # state_tensor is None
        x = MLP(self.mlp, name="mlp", dtype=self.dtype)(x)  # (b, 1, 256)
        raw = _dense(3 * self.ptnum + 12, "points_out", self.dtype)(x)  # linear
        transmat = raw[..., -12:-3].reshape(b, 3, 3)
        movemat = raw[..., -3:].reshape(b, 1, 3)
        pts = jnp.tanh(raw[..., : 3 * self.ptnum]).reshape(b, self.ptnum, 3)
        pts = jnp.einsum("bnc,bcd->bnd", pts, transmat) + movemat
        st = nn.relu(_dense(self.ptnum * 16, "state_out", self.dtype)(x)).reshape(b, self.ptnum, 16)
        st = jnp.concatenate(
            [st, jnp.broadcast_to(x, (b, self.ptnum, x.shape[-1]))], -1
        )
        st = MLP(self.mlp2, name="state_mlp", dtype=self.dtype)(st)
        st = nn.relu(_dense(self.state_len, "state_outo", self.dtype)(st))
        return pts, st


class DecodeCell(nn.Module):
    """Recurrent ×16 upsampler (`decode_cell`, vv_recon.py:312-364).

    Mask-attention gates the codeword per centre, an MLP emits 16 tanh
    offsets per centre, and the per-point state is upsampled through 16
    sequentially-chained `state_expand` branches.
    Returns (points (b, 16n, 3), state (b, 16n, S), moves (b, n, 16, 3)).

    Kernels are shared across the ``n_steps`` invocations; biases are
    per-step (``step`` = 0/1 ↔ checkpoint scopes decode_cell/decode_cell_1
    — see the module docstring and :class:`~rfnet_tpu.nn.StepDense`).
    """

    up_ratio: int = 16
    mlp: tuple = (256, 256)
    mlp1: tuple = (128, 64)
    mlp2: tuple = (128, 128)
    mlp_mask: tuple = (128, 128)
    mlp_expand: tuple = (128,)
    state_len: int = 128
    n_steps: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, code, center, state, step: int):
        ns = self.n_steps

        def sdense(ch, name):
            return StepDense(ch, ns, name=name, dtype=self.dtype)

        b, n, _ = center.shape
        clen = code.shape[-1]
        mask = jnp.concatenate([center, jnp.broadcast_to(code, (b, n, clen))], -1)
        mask = MLP(self.mlp_mask, name="mask_mlp", dtype=self.dtype, n_steps=ns)(mask, step)
        mask = nn.relu(sdense(clen, "mask_out")(mask, step))  # (b, n, clen)
        info = nn.relu(sdense(256, "input_trans")(mask * code, step))
        sinfo = nn.relu(sdense(128, "state_trans")(state, step))
        x = MLP(self.mlp, name="mlp", dtype=self.dtype, n_steps=ns)(
            jnp.concatenate([info, sinfo], -1), step
        )
        p = MLP(self.mlp1, name="points_mlp", dtype=self.dtype, n_steps=ns)(x, step)
        p = jnp.tanh(sdense(3 * self.up_ratio, "points_out")(p, step))
        moves = p.reshape(b, n, self.up_ratio, 3)
        pts = (center[:, :, None, :] + moves).reshape(b, n * self.up_ratio, 3)
        s = jnp.concatenate([x, jnp.broadcast_to(code, (b, n, clen))], -1)
        s = MLP(self.mlp2, name="state_mlp", dtype=self.dtype, n_steps=ns)(s, step)  # (b, n, 128)
        branches = []
        cur = s
        for i in range(self.up_ratio):
            # branch i feeds branch i+1 — the reference chains `newnew`
            # through every state_expand block (vv_recon.py:353-360)
            cur = MLP(self.mlp_expand, name=f"expand{i}_pre", dtype=self.dtype, n_steps=ns)(cur, step)
            cur = nn.leaky_relu(sdense(self.state_len, f"expand{i}")(cur, step))
            branches.append(cur)
        smove = jnp.stack(branches, axis=2)  # (b, n, up, S)
        new_state = (state[:, :, None, :] + smove).reshape(
            b, n * self.up_ratio, self.state_len
        )
        return pts, new_state, moves


class RefineLayer(nn.Module):
    """Residual tanh refinement of coords + state (`refine_layer`,
    vv_recon.py:272-310). Returns (coords, state, move_vec)."""

    mlp: tuple = (128, 64, 64)
    mlp2: tuple = (128, 128)
    mlpself: tuple = (128, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, pts, feat, feat2):
        b, n, _ = pts.shape
        t = jnp.concatenate([pts, jnp.broadcast_to(feat, (b, n, feat.shape[-1]))], -1)
        t = MLP(self.mlpself, name="self_mlp", dtype=self.dtype)(t)
        maxt = jnp.max(t, axis=1, keepdims=True)
        t = jnp.concatenate([pts, jnp.broadcast_to(maxt, (b, n, maxt.shape[-1]))], -1)
        t = MLP(self.mlp, name="mlp", dtype=self.dtype)(t)
        move = jnp.tanh(_dense(3, "out", self.dtype)(t))
        new_pts = pts + move
        s = jnp.concatenate(
            [new_pts, feat2, jnp.broadcast_to(feat, (b, n, feat.shape[-1]))], -1
        )
        s = MLP(self.mlp2, name="feat_mlp", dtype=self.dtype)(s)
        s = jnp.tanh(_dense(feat2.shape[-1], "feat_out", self.dtype)(s))
        return new_pts, feat2 + s, move


def merge_layer(rawpts, newpts, decfactor):
    """Pull each prediction toward its nearest observed input point with a
    learned Gaussian weight (`merge_layer`, vv_recon.py:132-139, knum=1).

    Gradient contract matches the reference: the argmin index carries no
    gradient, distances are recomputed from the gathered neighbours. Only
    the newpts→rawpts direction of the reference's nn_distance call is
    consumed (`vv_recon.py:134` uses idx2 alone), so the one-sided scan is
    used explicitly — half the kernel work.
    """
    _, nn_pts = nearest_neighbor_coords(newpts, rawpts)  # (b, np, 3)
    delta = nn_pts - newpts
    d2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    ratio = jnp.exp(-d2 / (1e-8 + decfactor**2))
    return newpts + ratio * delta


@dataclass
class RFNetOutputs:
    """Structured replacement for the reference's TF collections."""

    out1: jax.Array  # (b, 64, 3)    step-1 coarse, post merge+refine
    out2: jax.Array  # (b, 1024, 3)  step-2, post merge+refine
    out3: jax.Array  # (b, 16384, 3) step-3 raw decode output ('o2048')
    out4: jax.Array  # (b, 16384, 3) final, post merge+refine
    points1_pre: jax.Array  # 'points1' collection — PRE merge (b, 64, 3)
    points2_pre: jax.Array  # 'points2' collection — PRE merge (b, 1024, 3)
    moves1: jax.Array  # 'decode_cell64'   (b, 64, 16, 3)
    moves2: jax.Array  # 'decode_cell1024' (b, 1024, 16, 3)
    final_move: jax.Array  # 'refine_layer_final16384' (b, 16384, 3)
    code1: jax.Array
    code2: jax.Array
    code3: jax.Array
    decfactor_sq: jax.Array  # (3,) squared decline factors


jax.tree_util.register_dataclass(
    RFNetOutputs,
    data_fields=[
        "out1", "out2", "out3", "out4", "points1_pre", "points2_pre",
        "moves1", "moves2", "final_move", "code1", "code2", "code3",
        "decfactor_sq",
    ],
    meta_fields=[],
)


class RFNet(nn.Module):
    """The full 3-step completion pyramid (`full_process`, vv_recon.py:194-244)."""

    state_len: int = 256
    n_seed: int = 32  # FPS seeds moved + fresh points generated at step 1
    up_ratio: int = 16
    # computation dtype of the feature MLPs (params + coordinates stay f32);
    # bf16 is the serving mode — see nn.dense
    dtype: Any = None

    def setup(self):
        self.init_mlp = GlobalMLP((64, 128, self.state_len), name="init_mlp", dtype=self.dtype)
        self.cell = EncodeCell(
            mlp=(256, 384), mlpout=(256, 256), state_len=self.state_len, name="cell", dtype=self.dtype
        )
        self.recover1 = RecoverCell(name="recover1", dtype=self.dtype)
        self.recover2 = RecoverCell(name="recover2", dtype=self.dtype)
        self.recover3 = RecoverCell(name="recover3", dtype=self.dtype)
        self.init_move = InitMoveLayer(name="init_move", dtype=self.dtype)
        self.part_mlp = GlobalMLP((64, 128, self.state_len), name="part_mlp", dtype=self.dtype)
        self.feat_trans = MLP((256, 256), name="feat_trans", dtype=self.dtype)
        self.init_cell = InitDecodeLayer(ptnum=self.n_seed, name="init_cell", dtype=self.dtype)
        self.decode = DecodeCell(up_ratio=self.up_ratio, name="decode_cell", dtype=self.dtype)
        self.refine1 = RefineLayer(name="refine_layer1", dtype=self.dtype)
        self.refine2 = RefineLayer(name="refine_layer2", dtype=self.dtype)
        self.refine_final = RefineLayer(name="refine_layer_final", dtype=self.dtype)
        self.decfactor0 = self.param("decline_factor0", _scalar_xavier, (1,))
        self.decfactor1 = self.param("decline_factor1", _scalar_xavier, (1,))
        self.decfactor2 = self.param("decline_factor", _scalar_xavier, (1,))

    def __call__(self, pointcloud: jax.Array) -> RFNetOutputs:
        pc = pointcloud
        state = self.init_mlp(pc)

        # ---- step 1: coarse 64 = 32 generated + 32 moved FPS seeds --------
        code_raw, state = self.cell(pc, state, 0)
        code1 = self.recover1(code_raw, pc)
        seed = gather_point(pc, farthest_point_sample(self.n_seed, pc))
        moved, dstate_m = self.init_move(seed, code1)
        partfeat = self.part_mlp(jnp.concatenate([pc, moved], axis=1))
        gen, dstate_g = self.init_cell(
            self.feat_trans(jnp.concatenate([partfeat, code1], -1))
        )
        points1 = jnp.concatenate([gen, moved], axis=1)  # generated first (vv_recon.py:207)
        dstate = jnp.concatenate([dstate_g, dstate_m], axis=1)
        points1_pre = points1
        points1 = merge_layer(pc, points1, self.decfactor0)
        points1, dstate, _ = self.refine1(points1, code1, dstate)

        # ---- step 2: 64 -> 1024 -------------------------------------------
        pin = jnp.concatenate([pc, points1], axis=1)
        code_raw, state = self.cell(pin, state, 1)
        code2 = code1 + self.recover2(code_raw, pin)
        points2, dstate, moves1 = self.decode(code2, points1, dstate, 0)
        points2_pre = points2
        points2 = merge_layer(pc, points2, self.decfactor1)
        points2, dstate, _ = self.refine2(points2, code2, dstate)

        # ---- step 3: 1024 -> 16384 ----------------------------------------
        pin = jnp.concatenate([pc, points2], axis=1)
        code_raw, state = self.cell(pin, state, 2)
        code3 = code2 + self.recover3(code_raw, pin)
        points3, dstate, moves2 = self.decode(code3, points2, dstate, 1)
        points_final = merge_layer(pc, points3, self.decfactor2)
        points_final, _, final_move = self.refine_final(points_final, code3, dstate)

        return RFNetOutputs(
            out1=points1,
            out2=points2,
            out3=points3,
            out4=points_final,
            points1_pre=points1_pre,
            points2_pre=points2_pre,
            moves1=moves1,
            moves2=moves2,
            final_move=final_move,
            code1=code1,
            code2=code2,
            code3=code3,
            decfactor_sq=jnp.concatenate(
                [self.decfactor0**2, self.decfactor1**2, self.decfactor2**2]
            ),
        )
