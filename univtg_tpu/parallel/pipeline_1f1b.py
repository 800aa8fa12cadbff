"""True 1F1B pipelined training: manual forward/backward interleaving.

The GPipe path (parallel/pipeline.py) differentiates a scan-over-ticks with
plain autodiff: ALL microbatches stream forward, then XLA replays the
reverse schedule. Even with remat, autodiff must save the (mb, T, D) carry
at EVERY tick, so per-device activation memory grows with the microbatch
count M -- O((M + pp) * mb * T * D). That is exactly the memory wall 1F1B
exists to remove: interleave one backward between forwards so each stage
retains only O(pp) in-flight activations, independent of M (Narayanan et
al., PipeDream-Flush; Megatron-LM's default schedule).

This module implements 1F1B as a SINGLE scan whose tick body computes both
a forward and a backward microbatch-chunk per device -- no autodiff across
the scan; gradients are produced inside it with per-chunk ``jax.vjp`` and
accumulated into carry buffers. Saved state per device is a fixed ring of
chunk inputs whose size is independent of M.

Schedule (0-indexed stages, M microbatches, v = interleave virtual chunks
per device; chunk ``c`` of ``pp*v`` lives on device ``c % pp``, slot
``j = c // pp`` -- the same layout as the interleaved GPipe schedule, so
``v > 1`` consumes the SAME device-major parameter order,
parallel/pipeline.py:interleave_permutation):

    forward  of microbatch m, chunk c:  t_f = (m//pp)*pp*v + m%pp + c
    backward of microbatch m, chunk c:  t_b = t_f(m, 0) + D + (pp*v-1-c)

with flush offset ``D = pp*v - 1`` (the minimum that keeps
``t_b(m, last) >= t_f(m, last)``). Properties (verified exhaustively for
(pp, v, M) grids by tests/test_pipeline_1f1b.py::test_schedule_invariants):

* At most ONE forward chunk and ONE backward chunk run per device per
  tick -- the 1F1B invariant, now per virtual slot.
* The forward dependency t_f(m, c+1) = t_f(m, c) + 1 and backward
  dependency t_b(m, c-1) = t_b(m, c) + 1 each ride ONE ``lax.ppermute``
  per tick (forward ring s -> s+1, backward ring s -> s-1), for any v.
* On the LAST chunk (device pp-1, slot v-1) forward and backward may
  coincide (exactly at v=1): its backward tick recomputes
  chunk-forward -> heads -> loss from the saved chunk input in one
  ``jax.vjp``, seeding the backward ring.
* In-flight saved chunk inputs never exceed 2*pp per (device, slot) and
  microbatch ring index ``m % 2pp`` never collides, so the saved-input
  buffer is ``(v, 2*pp)`` chunk inputs per device: O(pp*v), independent
  of M. v=1 reduces to the classic bound 2(pp-1-s)+1 <= 2pp-1 at stage s.
* Total ticks: 2*(pp*v - 1) + ((M-1)//pp)*pp*v + (M-1)%pp + 1
  (= M + 2pp - 2 at v=1). A tick costs a 1/v-stage of compute, so like
  interleaved GPipe the fill/drain bubble TIME shrinks ~v-fold; the cost
  is v-fold more ppermute hops and up to v-fold more saved chunk inputs
  (still M-independent) -- the standard Megatron interleaved tradeoff.

The engine pipelines the WHOLE training step, not just the encoder: the
last chunk's backward computes the model heads and the loss per
microbatch. Loss semantics therefore follow the reference's DDP locality
(each worker's contrastive/normalized terms are computed over its local
rows, main/train_vlp_ddp.py:272-275): the total loss is the mean of
per-(microbatch x dp-shard) losses. tests/test_pipeline_1f1b.py pins
gradient equality against exactly that microbatched-loss definition.

Input projections ("pre") stay OUTSIDE the engine under plain autodiff:
the engine returns cotangents for the encoder input, the positional
embedding (when trainable), and the pre-projected vid/txt tokens the
saliency head consumes (a skip connection around the encoder,
model/univtg.py:139-147), and the caller pulls them back through ``pre``
with ``jax.vjp``. See train/steps_1f1b.make_1f1b_train_step.

Beyond-reference capability: the reference has no model parallelism at all
(DDP only). Unlike the GPipe/interleaved schedules the activation
footprint no longer scales with the microbatch count, which is what makes
large-M (small-bubble) pipelining viable on real pods.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from univtg_tpu.parallel.pipeline import interleave_permutation, schedule_active


def pipeline_1f1b_ticks(n_micro: int, pp: int, interleave: int = 1) -> int:
    """Last backward: microbatch M-1, chunk 0 -> tick
    (M-1)//pp*pp*v + (M-1)%pp + 2*(pp*v - 1); +1 converts index to count.
    Reduces to M + 2*pp - 2 at v=1."""
    v = max(1, interleave)
    return ((n_micro - 1) // pp) * pp * v + (n_micro - 1) % pp + 2 * (pp * v - 1) + 1


def schedule_1f1b(t: int, s: int, *, pp: int, n_micro: int, interleave: int = 1):
    """(tick, device) -> (forward (slot, microbatch) | None,
    backward (slot, microbatch) | None). Pure-Python mirror of the traced
    schedule for the invariant tests. Slot j holds global chunk s + pp*j."""
    v = max(1, interleave)
    D = pp * v - 1

    def decode(base):
        # base must equal (m//pp)*pp*v + m%pp for some live microbatch m
        if base < 0:
            return None
        rem = base % (pp * v)
        if rem >= pp:
            return None
        m = (base // (pp * v)) * pp + rem
        return m if m < n_micro else None

    fwd = bwd = None
    for j in range(v):
        c = s + pp * j
        m = decode(t - c)
        if m is not None:
            assert fwd is None, "two forward chunks on one device/tick"
            fwd = (j, m)
        m = decode(t - D - (pp * v - 1 - c))
        if m is not None:
            assert bwd is None, "two backward chunks on one device/tick"
            bwd = (j, m)
    return fwd, bwd


def _sched_bwd_traced(t, s, *, pp: int, v: int, n_micro: int):
    """Traced backward-schedule decode: (active?, slot j, microbatch m).
    Mirror of schedule_1f1b's backward branch (u = t - D - (pp*v-1-c))."""
    D = pp * v - 1
    js = jnp.arange(v)
    u = t - D - (pp * v - 1 - (s + pp * js))
    rem = u % (pp * v)
    mj = (u // (pp * v)) * pp + rem
    valid = (u >= 0) & (rem < pp) & (mj < n_micro)
    j_act = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    m_act = jnp.clip(jnp.where(any_valid, mj[j_act], 0), 0, n_micro - 1)
    return any_valid, j_act, m_act


def _tree_where(cond, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


def _tree_add_masked(acc, g, cond):
    return jax.tree_util.tree_map(
        lambda a, x: a + jnp.where(cond, x, jnp.zeros_like(x)), acc, g
    )


def _tree_zeros(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def pipeline_1f1b(
    stacked_params,
    head_params,
    src,
    mask,
    pos,
    vid,
    txt,
    vid_mask,
    txt_mask,
    targets,
    *,
    layer,
    heads_apply,
    loss_fn,
    n_micro: int,
    train: bool,
    rng_dropout,
    rng_droppath,
    need_pos_grad: bool = False,
    axis: str = "pp",
    interleave: int = 1,
    pre_permuted: bool = False,
    collect_aux: bool = False,
    aux_weight: float = 0.0,
):
    """Run one pipelined forward+backward over the batch; returns
    ``(loss, metrics, d_stacked, d_heads, d_src, d_pos, d_vid, d_txt)``.

    Args:
      stacked_params: encoder layer stack, leading axis ``num_layers``,
        canonical layer order (the scan_layers checkpoint layout) -- or
        device-major chunk order when ``pre_permuted=True`` (required
        layout for ``interleave > 1`` training states; the returned
        ``d_stacked`` uses the SAME layout as the input).
      head_params: pytree of the model-head parameters (replicated).
      src/mask/pos: (B, T, D)/(B, T)/(B, T, D) encoder input, key-padding
        mask, positional embedding (from the model's ``pre`` phase).
      vid/txt: (B, Lv, D)/(B, Lt, D) pre-encoder projections consumed by
        the saliency head (skip connection); vid_mask/txt_mask their masks.
      targets: per-sample supervision pytree, every leaf (B, ...).
      layer: unbound EncoderLayer -- the same stage body as the sequential
        scan and GPipe paths (no forked layer math).
      heads_apply: fn(head_params, memory, vid_mb, txt_mb, vmask_mb,
        tmask_mb) -> outputs dict (the model's ``heads`` method).
      loss_fn: fn(outputs, targets_mb) -> (scalar loss, metrics dict),
        computed over the LOCAL (microbatch x dp-shard) rows.
      n_micro: microbatch count M; B % M == 0 and (B/M) must tile over dp.
      rng_dropout / rng_droppath: base keys; folded per (microbatch, global
        canonical layer) so the backward's recompute regenerates the
        forward's masks exactly, for any schedule.
      need_pos_grad: accumulate and return d_pos (trainable text positions,
        cfg.use_txt_pos); otherwise d_pos is returned as None and the
        (M, mb, T, D) accumulator is never allocated.
      interleave: virtual chunks per device (v; module docstring).
      pre_permuted: stacked_params already in device-major chunk order
        (parallel.pipeline.permute_pipeline_params); otherwise the v>1
        path gathers the permutation per call (prefer pre-permuted for
        training -- a cross-device re-gather of the whole stack otherwise).
      collect_aux / aux_weight: the layer sows a scalar auxiliary loss
        (the MoE load-balance aux, ops/moe.py). Each chunk's BACKWARD
        recomputes it (every (microbatch, chunk) backward runs exactly
        once) and seeds its gradient with the constant cotangent
        aux_weight / (num_layers * M * dp) through the same per-chunk vjp
        that produces the task gradients -- so mid-stage routers get task-
        independent aux gradient they could never receive via the ring
        cotangent alone. The returned loss is
        task_weighted_total + aux_weight * aux_mean and
        metrics['loss_moe_aux'] reports aux_mean (the mean over
        layers x microbatches x dp shards, matching the GPipe engine's
        collect_aux semantics -- routing under a pipeline is per
        (microbatch x dp-shard)).

    Returned gradients: d_stacked is sharded P('pp') over the layer axis,
    in the input's layer order, and already dp-reduced; d_heads is
    replicated and dp-reduced; d_src / d_pos / d_vid / d_txt are per-row
    cotangents (B, ...) for the caller's ``pre``-phase vjp.
    ``loss``/``metrics`` are the global (M x dp)-mean.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        raise ValueError(
            "pipeline_1f1b needs an active jax.set_mesh context with a "
            f"'{axis}' axis (use parallel.make_mesh(..., pp=N))"
        )
    pp = mesh.shape[axis]
    if pp < 2:
        raise ValueError(f"pipeline_1f1b needs pp >= 2 (mesh has {axis}={pp})")
    v = max(1, interleave)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % (pp * v) != 0:
        raise ValueError(
            f"num_layers={num_layers} must tile over pp={pp} stages x "
            f"interleave={v} chunks"
        )
    B, T, D = src.shape
    M = n_micro
    if B % M != 0:
        raise ValueError(f"batch {B} must split into n_micro={M} microbatches")
    mb = B // M
    dp = mesh.shape.get("dp", 1)
    if mb % dp != 0:
        raise ValueError(
            f"microbatch size {mb} (= B {B} / n_micro {M}) must tile over "
            f"dp={dp}; lower n_micro or raise the batch size"
        )
    Lv, Lt = vid.shape[1], txt.shape[1]

    if v > 1 and not pre_permuted:
        perm = interleave_permutation(num_layers, pp, v)
        stacked_params = jax.tree_util.tree_map(lambda a: a[perm], stacked_params)

    def split_m(a):
        return a.reshape((M, mb) + a.shape[1:])

    src_m, mask_m, pos_m = split_m(src), split_m(mask), split_m(pos)
    vid_m, txt_m = split_m(vid), split_m(txt)
    vmask_m, tmask_m = split_m(vid_mask), split_m(txt_mask)
    targets_m = jax.tree_util.tree_map(split_m, targets)

    if rng_dropout is None:
        rng_dropout = jax.random.PRNGKey(0)
    if rng_droppath is None:
        rng_droppath = jax.random.PRNGKey(0)

    fn = functools.partial(
        _1f1b_stage_fn,
        layer=layer,
        heads_apply=heads_apply,
        loss_fn=loss_fn,
        pp=pp,
        v=v,
        dp=dp,
        n_micro=M,
        num_layers=num_layers,
        train=train,
        need_pos_grad=need_pos_grad,
        axis=axis,
        # tp AND ep ride the shard_map as AUTO axes; with either active the
        # tick body must be collective-uniform -- lax.cond branches would
        # put the auto-axis collectives (Megatron pair reshards, MoE
        # dispatch/combine all-to-alls) under device-divergent control
        # flow, the cross-device rendezvous deadlock documented at the
        # bwd_uniform docstring
        uniform=(
            mesh.shape.get("tp", 1) > 1 or mesh.shape.get("ep", 1) > 1
        ),
        collect_aux=collect_aux,
        aux_weight=aux_weight,
    )
    # manual over (dp, pp) only: every other mesh axis (tp) stays AUTO, so
    # tp-sharded stacked matrices (parallel/mesh.py pp x tp specs) keep
    # their feature-dim sharding through the per-chunk jax.vjp and XLA's
    # propagation inserts the Megatron pair collectives inside each tick
    row = P(None, "dp")
    d_pos_spec = (row,) if need_pos_grad else ()
    out = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(axis),  # stacked layer params
            P(),      # head params (replicated)
            row, row, row,  # src, mask, pos
            row, row,       # vid, txt
            row, row,       # vid_mask, txt_mask
            row,            # targets
            P(), P(),       # rng keys
        ),
        out_specs=(P(), P(), P(axis), P(), row) + d_pos_spec + (row, row),
        axis_names=frozenset({"dp", axis}),
        check_vma=False,
    )(
        stacked_params, head_params, src_m, mask_m, pos_m,
        vid_m, txt_m, vmask_m, tmask_m, targets_m,
        rng_dropout, rng_droppath,
    )
    if need_pos_grad:
        loss, metrics, d_stacked, d_heads, d_src, d_pos, d_vid, d_txt = out
        d_pos = d_pos.reshape(B, T, D)
    else:
        loss, metrics, d_stacked, d_heads, d_src, d_vid, d_txt = out
        d_pos = None

    if v > 1 and not pre_permuted:
        # return grads in the caller's (canonical) layer order
        perm = interleave_permutation(num_layers, pp, v)
        inv = jnp.zeros_like(jnp.asarray(perm)).at[jnp.asarray(perm)].set(
            jnp.arange(len(perm))
        )
        d_stacked = jax.tree_util.tree_map(lambda a: a[inv], d_stacked)
    return (
        loss,
        metrics,
        d_stacked,
        d_heads,
        d_src.reshape(B, T, D),
        d_pos,
        d_vid.reshape(B, Lv, -1),
        d_txt.reshape(B, Lt, -1),
    )


def _1f1b_stage_fn(
    params_stage, head_params, src_m, mask_m, pos_m,
    vid_m, txt_m, vmask_m, tmask_m, targets_m, rng_dropout, rng_droppath,
    *, layer, heads_apply, loss_fn, pp, v, dp, n_micro, num_layers, train,
    need_pos_grad, axis, uniform=False, collect_aux=False, aux_weight=0.0,
):
    """Per-device 1F1B body. ``params_stage`` holds this device's
    ``v * (num_layers/(pp*v))`` layer slice in slot-major chunk order (at
    v=1: the contiguous canonical chunk); the microbatched activations /
    targets hold the dp-local rows of ALL microbatches (the schedule
    decodes which microbatch is in flight -- nothing travels with the
    activation except the activation itself)."""
    s = jax.lax.axis_index(axis)
    M = n_micro
    Lc = num_layers // (pp * v)  # layers per chunk
    buf_n = 2 * pp  # per-slot ring; m % 2pp never collides (module docstring)
    inv = 1.0 / (M * dp)  # global loss = mean over (microbatch x dp) blocks
    # aux cotangent: d(aux_weight * aux_mean)/d(aux_chunk), aux_mean the
    # mean over (layers x microbatches x dp shards) of per-layer auxes
    aux_cot = jnp.float32(aux_weight / (num_layers * M * dp))

    def slot_params(j):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, j * Lc, Lc, 0),
            params_stage,
        )

    def chunk_fwd(p_chunk, h, kmask, posb, m, j):
        """One chunk (this device's slot j), same body as the sequential
        scan. RNG folds per (microbatch, GLOBAL canonical layer): schedule-
        independent, so the backward's recompute regenerates the forward's
        dropout/droppath masks exactly."""

        def body(carry, inp):
            p_layer, k = inp
            rngs = None
            if train:
                gid = m * num_layers + (s + pp * j) * Lc + k
                rngs = {
                    "dropout": jax.random.fold_in(rng_dropout, gid),
                    "droppath": jax.random.fold_in(rng_droppath, gid),
                }
            if collect_aux:
                h, aux = carry
                from univtg_tpu.ops.moe import sown_moe_aux_sum

                h, ivars = layer.apply(
                    {"params": p_layer}, h, kmask, posb, train=train,
                    rngs=rngs, mutable=["intermediates"],
                )
                return (h, aux + sown_moe_aux_sum(ivars)), None
            h = layer.apply(
                {"params": p_layer}, carry, kmask, posb, train=train,
                rngs=rngs,
            )
            return h, None

        if collect_aux:
            (h, aux), _ = jax.lax.scan(
                body, (h, jnp.zeros((), jnp.float32)),
                (p_chunk, jnp.arange(Lc)),
            )
            return h, aux
        h, _ = jax.lax.scan(body, h, (p_chunk, jnp.arange(Lc)))
        return h

    def f_last(p_chunk, p_heads, h, posb, vid_mb, txt_mb,
               kmask, vmask_mb, tmask_mb, t_mb, m):
        """Last chunk's fused backward target: chunk -> heads -> scaled
        loss, recomputed from the saved chunk input. With collect_aux the
        chunk's own aux joins the differentiated scalar (weighted) so ONE
        vjp seeds both task and aux cotangents; the raw aux value rides
        the vjp aux output for the value accumulator."""
        if collect_aux:
            mem, aux_c = chunk_fwd(p_chunk, h, kmask, posb, m, v - 1)
        else:
            mem, aux_c = chunk_fwd(p_chunk, h, kmask, posb, m, v - 1), 0.0
        outputs = heads_apply(p_heads, mem, vid_mb, txt_mb, vmask_mb, tmask_mb)
        loss, metrics = loss_fn(outputs, t_mb)
        total = loss * inv
        if collect_aux:
            total = total + aux_c * aux_cot
        return total, (
            jax.tree_util.tree_map(lambda x: x * inv, metrics),
            jnp.asarray(aux_c, jnp.float32),
        )

    def idx(a, m):
        return jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False)

    # zero templates for the cond branches (both must return one pytree)
    zero_slot = _tree_zeros(slot_params(0))
    metrics_shape = jax.eval_shape(
        f_last,
        zero_slot, head_params, src_m[0], pos_m[0], vid_m[0], txt_m[0],
        mask_m[0], vmask_m[0], tmask_m[0],
        jax.tree_util.tree_map(lambda a: a[0], targets_m), 0,
    )[1][0]
    zero_metrics = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), metrics_shape
    )
    zero_d_heads = _tree_zeros(head_params)

    def tick(carry, t):
        (fwd_ring, bwd_ring, buf, d_layers, d_heads, d_src, d_pos,
         d_vid, d_txt, loss_acc, metrics_acc, aux_acc) = carry

        # ---- forward phase: device s runs chunk slot j_f, microbatch m_f
        act_f, j_f, m_f = schedule_active(t, s, pp=pp, v=v, n_micro=M)
        # chunk 0 (slot 0 on device 0) takes fresh input; every other chunk
        # consumes the forward ring
        inject = jnp.logical_and(s == 0, j_f == 0)
        h_in = jnp.where(inject, idx(src_m, m_f), fwd_ring)
        # retain the chunk INPUT for the backward's recompute; masked write
        # so idle ticks never clobber a live slot
        slot_idx = j_f * buf_n + m_f % buf_n
        buf = _tree_where(
            act_f,
            jax.lax.dynamic_update_index_in_dim(buf, h_in, slot_idx, 0),
            buf,
        )
        # the last chunk's forward output is only consumed through its own
        # backward recompute -- skip the dead compute. In uniform mode the
        # chunk runs unconditionally (collective-uniform ticks; see below):
        # its output permutes to device 0, whose only coinciding consumer
        # is the inject slot (j=0 on s=0), which ignores the ring.
        is_last_f = jnp.logical_and(s == pp - 1, j_f == v - 1)

        def fwd_chunk_only(h, kmask, posb, m, j):
            # the forward tick only needs the activation; the aux VALUE and
            # its gradient both come from the backward's recompute (every
            # (microbatch, chunk) backward runs exactly once)
            out = chunk_fwd(slot_params(j), h, kmask, posb, m, j)
            return out[0] if collect_aux else out

        if uniform:
            h_out = fwd_chunk_only(
                h_in, idx(mask_m, m_f), idx(pos_m, m_f), m_f, j_f
            )
        else:
            h_out = jax.lax.cond(
                is_last_f,
                lambda: jnp.zeros_like(h_in),
                lambda: fwd_chunk_only(
                    h_in, idx(mask_m, m_f), idx(pos_m, m_f), m_f, j_f
                ),
            )

        # ---- backward phase: device s runs chunk slot j_b, microbatch m_b
        act_b, j_b, m_b = _sched_bwd_traced(t, s, pp=pp, v=v, n_micro=M)
        kmask_b = idx(mask_m, m_b)
        posb_b = idx(pos_m, m_b)
        t_mb = jax.tree_util.tree_map(lambda a: idx(a, m_b), targets_m)
        h_saved = idx(buf, j_b * buf_n + m_b % buf_n)
        p_slot_b = slot_params(j_b)

        def bwd_last():
            args = (
                p_slot_b, head_params, h_saved, posb_b,
                idx(vid_m, m_b), idx(txt_m, m_b),
            )
            loss_mb, vjp, (metrics_mb, aux_mb) = jax.vjp(
                lambda p, ph, h, pb, vb, tb: f_last(
                    p, ph, h, pb, vb, tb,
                    kmask_b, idx(vmask_m, m_b), idx(tmask_m, m_b),
                    t_mb, m_b,
                ),
                *args,
                has_aux=True,
            )
            dP, dH, dh, dpos, dv, dt = vjp(jnp.ones((), dtype=jnp.float32))
            return dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb, aux_mb

        def bwd_mid():
            if collect_aux:
                # two primal outputs (h, aux): the aux cotangent is the
                # CONSTANT aux_cot -- this is how mid-stage routers receive
                # their load-balance gradient (the ring cotangent alone
                # carries no aux information)
                (_, aux_p), vjp = jax.vjp(
                    lambda p, h, pb: chunk_fwd(p, h, kmask_b, pb, m_b, j_b),
                    p_slot_b, h_saved, posb_b,
                )
                dP, dh, dpos = vjp((bwd_ring, aux_cot))
            else:
                _, vjp = jax.vjp(
                    lambda p, h, pb: chunk_fwd(p, h, kmask_b, pb, m_b, j_b),
                    p_slot_b, h_saved, posb_b,
                )
                dP, dh, dpos = vjp(bwd_ring)
                aux_p = jnp.zeros((), jnp.float32)
            return (
                dP, zero_d_heads, dh, dpos,
                jnp.zeros_like(vid_m[0]), jnp.zeros_like(txt_m[0]),
                jnp.zeros((), jnp.float32), zero_metrics, aux_p,
            )

        def bwd_uniform():
            """Collective-uniform backward (tp > 1): every device runs the
            SAME op sequence every tick -- one chunk vjp, then one
            heads+loss vjp -- and a ``where`` selects the ring cotangent
            vs the loss cotangent. ``lax.cond`` branches would put the
            auto-axis (tp) collectives under device-divergent control
            flow: the partitioner cannot prove each branch uniform per tp
            subgroup, and the mismatched collective schedules deadlock
            cross-device (observed as a rendezvous timeout on XLA:CPU).
            Extra cost vs the cond path: the small heads+loss fwd/bwd per
            tick on every device (masked out except on the last chunk)."""
            if collect_aux:
                (mem, aux_c), vjp_chunk = jax.vjp(
                    lambda p, h, pb: chunk_fwd(p, h, kmask_b, pb, m_b, j_b),
                    p_slot_b, h_saved, posb_b,
                )
            else:
                mem, vjp_chunk = jax.vjp(
                    lambda p, h, pb: chunk_fwd(p, h, kmask_b, pb, m_b, j_b),
                    p_slot_b, h_saved, posb_b,
                )
                aux_c = jnp.zeros((), jnp.float32)

            def f_heads(ph, mem_, vb, tb):
                outputs = heads_apply(
                    ph, mem_, vb, tb, idx(vmask_m, m_b), idx(tmask_m, m_b)
                )
                loss, metrics = loss_fn(outputs, t_mb)
                return loss * inv, jax.tree_util.tree_map(
                    lambda x: x * inv, metrics
                )

            loss_mb, vjp_heads, metrics_mb = jax.vjp(
                f_heads, head_params, mem, idx(vid_m, m_b), idx(txt_m, m_b),
                has_aux=True,
            )
            dH, d_mem, dv, dt = vjp_heads(jnp.ones((), jnp.float32))
            cot = jnp.where(is_last_b, d_mem, bwd_ring)
            if collect_aux:
                # EVERY chunk (last included) seeds its aux cotangent here,
                # uniformly across devices -- no branch needed
                dP, dh, dpos = vjp_chunk((cot, aux_cot))
            else:
                dP, dh, dpos = vjp_chunk(cot)
            return dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb, aux_c

        is_last_b = jnp.logical_and(s == pp - 1, j_b == v - 1)
        if uniform:
            (dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb,
             aux_mb) = bwd_uniform()
        else:
            (dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb,
             aux_mb) = jax.lax.cond(is_last_b, bwd_last, bwd_mid)

        # accumulate the slot's layer grads into its slice of the device's
        # stacked-grad buffer
        def acc_slot(d_leaf, g_leaf):
            cur = jax.lax.dynamic_slice_in_dim(d_leaf, j_b * Lc, Lc, 0)
            upd = jnp.where(act_b, cur + g_leaf, cur)
            return jax.lax.dynamic_update_slice_in_dim(d_leaf, upd, j_b * Lc, 0)

        d_layers = jax.tree_util.tree_map(acc_slot, d_layers, dP)
        write_last = act_b & is_last_b
        # cond path: bwd_mid returns zero dH, so act_b masking suffices;
        # uniform path: dH is garbage off the last chunk -- mask tighter
        d_heads = _tree_add_masked(
            d_heads, dH, write_last if uniform else act_b
        )
        write_src = act_b & (s == 0) & (j_b == 0)
        d_src = _tree_where(
            write_src,
            jax.lax.dynamic_update_index_in_dim(d_src, dh, m_b, 0),
            d_src,
        )
        if need_pos_grad:
            d_pos = _tree_where(
                act_b,
                jax.lax.dynamic_update_index_in_dim(
                    d_pos, idx(d_pos, m_b) + dpos, m_b, 0
                ),
                d_pos,
            )
        d_vid = _tree_where(
            write_last,
            jax.lax.dynamic_update_index_in_dim(d_vid, dv, m_b, 0),
            d_vid,
        )
        d_txt = _tree_where(
            write_last,
            jax.lax.dynamic_update_index_in_dim(d_txt, dt, m_b, 0),
            d_txt,
        )
        loss_acc = loss_acc + jnp.where(write_last, loss_mb, 0.0)
        metrics_acc = _tree_add_masked(metrics_acc, metrics_mb, write_last)
        # every active backward chunk contributes its aux value (idle-tick
        # garbage masked out)
        aux_acc = aux_acc + jnp.where(act_b, aux_mb, 0.0)

        # ring transfers: activations s -> s+1, cotangents s -> s-1.
        # The barrier imposes a TOTAL ORDER between the two independent
        # collective-permutes: under partial-auto execution (tp as an AUTO
        # axis) the cond branches above contain device-divergent tp
        # collectives, and a concurrent thunk executor may otherwise start
        # the two permutes in a different order on different devices --
        # a cross-device rendezvous deadlock (observed on XLA:CPU).
        fwd_ring = jax.lax.ppermute(
            h_out, axis, [(i, (i + 1) % pp) for i in range(pp)]
        )
        fwd_ring, dh = jax.lax.optimization_barrier((fwd_ring, dh))
        bwd_ring = jax.lax.ppermute(
            dh, axis, [(i, (i - 1) % pp) for i in range(pp)]
        )
        return (
            (fwd_ring, bwd_ring, buf, d_layers, d_heads, d_src, d_pos,
             d_vid, d_txt, loss_acc, metrics_acc, aux_acc),
            None,
        )

    mb_shape = src_m.shape[1:]
    carry0 = (
        jnp.zeros(mb_shape, src_m.dtype),          # fwd ring
        jnp.zeros(mb_shape, src_m.dtype),          # bwd ring
        jnp.zeros((v * buf_n,) + mb_shape, src_m.dtype),  # saved chunk inputs
        _tree_zeros(params_stage),                 # layer grads
        zero_d_heads,                              # head grads
        jnp.zeros_like(src_m),                     # d_src
        jnp.zeros_like(pos_m) if need_pos_grad else jnp.zeros((), jnp.float32),
        jnp.zeros_like(vid_m),                     # d_vid
        jnp.zeros_like(txt_m),                     # d_txt
        jnp.zeros((), jnp.float32),                # loss
        zero_metrics,                              # metrics
        jnp.zeros((), jnp.float32),                # aux value
    )
    (_, _, _, d_layers, d_heads, d_src, d_pos, d_vid, d_txt,
     loss_acc, metrics_acc, aux_acc) = jax.lax.scan(
        tick, carry0, jnp.arange(pipeline_1f1b_ticks(M, pp, v))
    )[0]

    # reductions: loss/metrics/head grads live on the last stage only
    # (zeros elsewhere) -> psum over pp replicates; dp is the data-parallel
    # gradient reduction. Per-row cotangents reduce over pp only.
    psum_all = lambda x: jax.lax.psum(jax.lax.psum(x, axis), "dp")
    loss = psum_all(loss_acc)
    metrics = jax.tree_util.tree_map(psum_all, metrics_acc)
    if collect_aux:
        # mean over (layers x microbatches x dp): per-device aux_acc summed
        # its local chunks' per-layer auxes over all microbatches
        aux_mean = psum_all(aux_acc) / (num_layers * M * dp)
        metrics = dict(metrics)
        metrics["loss_moe_aux"] = aux_mean
        # reported total = weighted task mean + weighted aux mean (the
        # loss_acc scalar mixes in the last chunk's aux on the cond path
        # only -- rebuild the total from the clean components instead)
        loss = metrics["loss_overall"] + aux_weight * aux_mean
    d_layers = jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g, "dp"), d_layers
    )
    d_heads = jax.tree_util.tree_map(psum_all, d_heads)
    d_src = jax.lax.psum(d_src, axis)
    d_vid = jax.lax.psum(d_vid, axis)
    d_txt = jax.lax.psum(d_txt, axis)
    out = (loss, metrics, d_layers, d_heads, d_src)
    if need_pos_grad:
        out = out + (jax.lax.psum(d_pos, axis),)
    return out + (d_vid, d_txt)
