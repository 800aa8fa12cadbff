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
``2*pp`` chunk inputs (the schedule's in-flight span is ``2(pp-1-s)+1 <=
2pp-1`` microbatches at stage ``s``), so activation memory is O(pp * mb *
T * D) regardless of M.

Schedule (one combined F+B tick; 0-indexed stages, M microbatches):

    forward  of microbatch m at stage s:   tick  t = m + s
    backward of microbatch m at stage s:   tick  t = m + 2*pp - 2 - s

* On the LAST stage these coincide (t = m + pp - 1): its tick fuses
  chunk-forward -> heads -> loss -> chunk-backward in one ``jax.vjp``,
  seeding the backward ring.
* The forward dependency t_f(s+1) = t_f(s) + 1 and backward dependency
  t_b(s-1) = t_b(s) + 1 each ride ONE ``lax.ppermute`` per tick (forward
  ring s -> s+1, backward ring s -> s-1).
* Total ticks: M + 2*pp - 2. Steady state runs exactly one F and one B
  per device per tick -- the 1F1B invariant.
* In-flight forwards at stage s (saved, awaiting backward):
  (t - s) - (t - 2pp + 2 + s) = 2(pp - 1 - s), +1 for the one being
  produced -- hence the 2*pp ring never collides.

The engine pipelines the WHOLE training step, not just the encoder: the
last stage computes the model heads and the loss per microbatch. Loss
semantics therefore follow the reference's DDP locality (each worker's
contrastive/normalized terms are computed over its local rows,
main/train_vlp_ddp.py:272-275): the total loss is the mean of per-(
microbatch x dp-shard) losses. tests/test_pipeline_1f1b.py pins gradient
equality against exactly that microbatched-loss definition.

Input projections ("pre") stay OUTSIDE the engine under plain autodiff:
the engine returns cotangents for the encoder input, the positional
embedding (when trainable), and the pre-projected vid/txt tokens the
saliency head consumes (a skip connection around the encoder,
model/univtg.py:139-147), and the caller pulls them back through ``pre``
with ``jax.vjp``. See train/steps_1f1b.make_1f1b_train_step.

Beyond-reference capability: the reference has no model parallelism at all
(DDP only). Like the GPipe/interleaved schedules this pays off on encoder
variants far deeper than the 4-layer flagship; unlike them its activation
footprint no longer scales with the microbatch count, which is what makes
large-M (small-bubble) pipelining viable on real pods.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_1f1b_ticks(n_micro: int, pp: int) -> int:
    """Last backward: microbatch M-1 at stage 0 -> tick M-1 + 2pp - 2."""
    return n_micro + 2 * pp - 2


def schedule_1f1b(t: int, s: int, *, pp: int, n_micro: int):
    """(tick, stage) -> (fwd microbatch | None, bwd microbatch | None).
    Pure-Python mirror of the traced schedule for the invariant tests."""
    m_f = t - s
    m_b = t - (2 * pp - 2 - s)
    return (
        m_f if 0 <= m_f < n_micro else None,
        m_b if 0 <= m_b < n_micro else None,
    )


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
):
    """Run one pipelined forward+backward over the batch; returns
    ``(loss, metrics, d_stacked, d_heads, d_src, d_pos, d_vid, d_txt)``.

    Args:
      stacked_params: encoder layer stack, leading axis ``num_layers``,
        canonical layer order (the scan_layers checkpoint layout).
      head_params: pytree of the model-head parameters (replicated).
      src/mask/pos: (B, T, D)/(B, T)/(B, T, D) encoder input, key-padding
        mask, positional embedding (from the model's ``pre`` phase).
      vid/txt: (B, Lv, D)/(B, Lt, D) pre-encoder projections consumed by
        the saliency head (skip connection); vid_mask/txt_mask their masks.
      targets: per-sample supervision pytree, every leaf (B, ...).
      layer: unbound EncoderLayer -- the same stage body as the sequential
        scan and GPipe paths (no forked layer math).
      heads_apply: fn(head_params, memory, vid_mb, txt_mb, vid_mask_mb,
        txt_mask_mb) -> outputs dict (the model's ``heads`` method).
      loss_fn: fn(outputs, targets_mb) -> (scalar loss, metrics dict),
        computed over the LOCAL (microbatch x dp-shard) rows.
      n_micro: microbatch count M; B % M == 0 and (B/M) must tile over dp.
      rng_dropout / rng_droppath: base keys; folded per (microbatch, global
        layer) so the backward's recompute regenerates the forward's masks
        exactly.
      need_pos_grad: accumulate and return d_pos (trainable text positions,
        cfg.use_txt_pos); otherwise d_pos is returned as None and the
        (M, mb, T, D) accumulator is never allocated.

    Returned gradients: d_stacked is sharded P('pp') over the layer axis
    and already dp-reduced; d_heads is replicated and dp-reduced; d_src /
    d_pos / d_vid / d_txt are per-row cotangents (B, ...) for the caller's
    ``pre``-phase vjp. ``loss``/``metrics`` are the global (M x dp)-mean.
    """
    from jax.experimental.shard_map import shard_map

    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        raise ValueError(
            "pipeline_1f1b needs an active jax.set_mesh context with a "
            f"'{axis}' axis (use parallel.make_mesh(..., pp=N))"
        )
    pp = mesh.shape[axis]
    if pp < 2:
        raise ValueError(f"pipeline_1f1b needs pp >= 2 (mesh has {axis}={pp})")
    if mesh.shape.get("tp", 1) != 1:
        raise ValueError(
            "pipeline_1f1b supports (dp, pp) meshes only; set tp=1 (tensor-"
            "parallel layer shards inside a manual-vjp stage are not wired)"
        )
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % pp != 0:
        raise ValueError(
            f"num_layers={num_layers} must tile over pp={pp} stages"
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
        dp=dp,
        n_micro=M,
        num_layers=num_layers,
        train=train,
        need_pos_grad=need_pos_grad,
        axis=axis,
    )
    row = P(None, "dp")
    d_pos_spec = (row,) if need_pos_grad else ()
    out = shard_map(
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
        check_rep=False,
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
    *, layer, heads_apply, loss_fn, pp, dp, n_micro, num_layers, train,
    need_pos_grad, axis,
):
    """Per-device 1F1B body. ``params_stage`` holds this device's contiguous
    ``num_layers/pp`` layer slice; the microbatched activations/targets hold
    the dp-local rows of ALL microbatches (the schedule decodes which
    microbatch is in flight -- nothing travels with the activation except
    the activation itself)."""
    s = jax.lax.axis_index(axis)
    M = n_micro
    Lc = num_layers // pp
    buf_n = 2 * pp
    inv = 1.0 / (M * dp)  # global loss = mean over (microbatch x dp) blocks

    def chunk_fwd(p_chunk, h, kmask, posb, m):
        """This device's layer slice, same body as the sequential scan."""

        def body(carry, inp):
            p_layer, k = inp
            rngs = None
            if train:
                # fold per (microbatch, GLOBAL layer): tick-independent, so
                # the backward's recompute regenerates the forward's
                # dropout/droppath masks exactly
                gid = m * num_layers + s * Lc + k
                rngs = {
                    "dropout": jax.random.fold_in(rng_dropout, gid),
                    "droppath": jax.random.fold_in(rng_droppath, gid),
                }
            h = layer.apply(
                {"params": p_layer}, carry, kmask, posb, train=train,
                rngs=rngs,
            )
            return h, None

        h, _ = jax.lax.scan(body, h, (p_chunk, jnp.arange(Lc)))
        return h

    def f_last(p_chunk, p_heads, h, posb, vid_mb, txt_mb,
               kmask, vmask_mb, tmask_mb, t_mb, m):
        """Last stage's fused tick: chunk -> heads -> scaled loss."""
        mem = chunk_fwd(p_chunk, h, kmask, posb, m)
        outputs = heads_apply(p_heads, mem, vid_mb, txt_mb, vmask_mb, tmask_mb)
        loss, metrics = loss_fn(outputs, t_mb)
        return loss * inv, jax.tree_util.tree_map(lambda v: v * inv, metrics)

    def idx(a, m):
        return jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False)

    # zero templates for the cond branches (both must return one pytree)
    metrics_shape = jax.eval_shape(
        f_last,
        params_stage, head_params, src_m[0], pos_m[0], vid_m[0], txt_m[0],
        mask_m[0], vmask_m[0], tmask_m[0],
        jax.tree_util.tree_map(lambda a: a[0], targets_m), 0,
    )[1]
    zero_metrics = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), metrics_shape
    )
    zero_d_heads = _tree_zeros(head_params)

    def tick(carry, t):
        (fwd_ring, bwd_ring, buf, d_layers, d_heads, d_src, d_pos,
         d_vid, d_txt, loss_acc, metrics_acc) = carry

        # ---- forward phase: stage s runs microbatch m_f = t - s ----
        m_f = t - s
        act_f = (m_f >= 0) & (m_f < M)
        m_fc = jnp.clip(m_f, 0, M - 1)
        h_in = jnp.where(s == 0, idx(src_m, m_fc), fwd_ring)
        # retain the chunk INPUT for the backward's recompute; masked write
        # so idle ticks never clobber a live slot
        buf = _tree_where(
            act_f,
            jax.lax.dynamic_update_index_in_dim(buf, h_in, m_fc % buf_n, 0),
            buf,
        )
        # the last stage's forward is fused into its backward below
        h_out = jax.lax.cond(
            s == pp - 1,
            lambda: jnp.zeros_like(h_in),
            lambda: chunk_fwd(
                params_stage, h_in, idx(mask_m, m_fc), idx(pos_m, m_fc), m_fc
            ),
        )

        # ---- backward phase: stage s runs microbatch m_b ----
        m_b = t - (2 * pp - 2 - s)
        act_b = (m_b >= 0) & (m_b < M)
        m_bc = jnp.clip(m_b, 0, M - 1)
        kmask_b = idx(mask_m, m_bc)
        posb_b = idx(pos_m, m_bc)
        t_mb = jax.tree_util.tree_map(lambda a: idx(a, m_bc), targets_m)

        def bwd_last():
            # fused F+B: on the last stage m_b == m_f, so h_in IS this
            # microbatch's chunk input
            args = (
                params_stage, head_params, h_in, posb_b,
                idx(vid_m, m_bc), idx(txt_m, m_bc),
            )
            loss_mb, vjp, metrics_mb = jax.vjp(
                lambda p, ph, h, pb, vb, tb: f_last(
                    p, ph, h, pb, vb, tb,
                    kmask_b, idx(vmask_m, m_bc), idx(tmask_m, m_bc),
                    t_mb, m_bc,
                ),
                *args,
                has_aux=True,
            )
            dP, dH, dh, dpos, dv, dt = vjp(jnp.ones((), dtype=jnp.float32))
            return dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb

        def bwd_mid():
            h_saved = idx(buf, m_bc % buf_n)
            _, vjp = jax.vjp(
                lambda p, h, pb: chunk_fwd(p, h, kmask_b, pb, m_bc),
                params_stage, h_saved, posb_b,
            )
            dP, dh, dpos = vjp(bwd_ring)
            return (
                dP, zero_d_heads, dh, dpos,
                jnp.zeros_like(vid_m[0]), jnp.zeros_like(txt_m[0]),
                jnp.zeros((), jnp.float32), zero_metrics,
            )

        dP, dH, dh, dpos, dv, dt, loss_mb, metrics_mb = jax.lax.cond(
            s == pp - 1, bwd_last, bwd_mid
        )

        d_layers = _tree_add_masked(d_layers, dP, act_b)
        d_heads = _tree_add_masked(d_heads, dH, act_b)
        write_src = act_b & (s == 0)
        d_src = _tree_where(
            write_src,
            jax.lax.dynamic_update_index_in_dim(d_src, dh, m_bc, 0),
            d_src,
        )
        if need_pos_grad:
            d_pos = _tree_where(
                act_b,
                jax.lax.dynamic_update_index_in_dim(
                    d_pos, idx(d_pos, m_bc) + dpos, m_bc, 0
                ),
                d_pos,
            )
        write_last = act_b & (s == pp - 1)
        d_vid = _tree_where(
            write_last,
            jax.lax.dynamic_update_index_in_dim(d_vid, dv, m_bc, 0),
            d_vid,
        )
        d_txt = _tree_where(
            write_last,
            jax.lax.dynamic_update_index_in_dim(d_txt, dt, m_bc, 0),
            d_txt,
        )
        loss_acc = loss_acc + jnp.where(write_last, loss_mb, 0.0)
        metrics_acc = _tree_add_masked(metrics_acc, metrics_mb, write_last)

        # ring transfers: activations s -> s+1, cotangents s -> s-1
        fwd_ring = jax.lax.ppermute(
            h_out, axis, [(i, (i + 1) % pp) for i in range(pp)]
        )
        bwd_ring = jax.lax.ppermute(
            dh, axis, [(i, (i - 1) % pp) for i in range(pp)]
        )
        return (
            (fwd_ring, bwd_ring, buf, d_layers, d_heads, d_src, d_pos,
             d_vid, d_txt, loss_acc, metrics_acc),
            None,
        )

    mb_shape = src_m.shape[1:]
    carry0 = (
        jnp.zeros(mb_shape, src_m.dtype),          # fwd ring
        jnp.zeros(mb_shape, src_m.dtype),          # bwd ring
        jnp.zeros((buf_n,) + mb_shape, src_m.dtype),  # saved chunk inputs
        _tree_zeros(params_stage),                 # layer grads
        zero_d_heads,                              # head grads
        jnp.zeros_like(src_m),                     # d_src
        jnp.zeros_like(pos_m) if need_pos_grad else jnp.zeros((), jnp.float32),
        jnp.zeros_like(vid_m),                     # d_vid
        jnp.zeros_like(txt_m),                     # d_txt
        jnp.zeros((), jnp.float32),                # loss
        zero_metrics,                              # metrics
    )
    (_, _, _, d_layers, d_heads, d_src, d_pos, d_vid, d_txt,
     loss_acc, metrics_acc) = jax.lax.scan(
        tick, carry0, jnp.arange(pipeline_1f1b_ticks(M, pp))
    )[0]

    # reductions: loss/metrics/head grads live on the last stage only
    # (zeros elsewhere) -> psum over pp replicates; dp is the data-parallel
    # gradient reduction. Per-row cotangents reduce over pp only.
    psum_all = lambda x: jax.lax.psum(jax.lax.psum(x, axis), "dp")
    loss = psum_all(loss_acc)
    metrics = jax.tree_util.tree_map(psum_all, metrics_acc)
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
