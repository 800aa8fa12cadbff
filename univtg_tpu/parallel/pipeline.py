"""Pipeline parallelism (GPipe + interleaved schedule) over the encoder stack.

The scan-layers parameter layout (``encoder/layers/layer/*`` with a leading
layer axis, models/encoder.py) is already the layout pipeline parallelism
wants: shard that leading axis over a ``pp`` mesh axis so each device holds
``num_layers / pp`` layers, split the batch into microbatches, and stream
activations stage-to-stage with ``lax.ppermute``. Checkpoints are
interchangeable with scan_layers — no conversion needed.

Execution model — one ``lax.scan`` over ticks inside a ``shard_map``. Two
schedules, selected by ``interleave`` (= v):

**GPipe (v=1).** Stage ``s`` holds one contiguous chunk of ``L/pp`` layers.
At tick ``t`` it applies its chunk to microbatch ``t - s`` (stage 0 injects
fresh microbatch ``t``), then ppermutes the activation to stage ``s+1``.
All ``M`` microbatches drain after ``M + pp - 1`` ticks; the bubble
fraction is ``(pp-1)/(M+pp-1)`` of the wall-clock.

**Interleaved / virtual stages (v>1).** The layer stack is cut into
``pp*v`` chunks of ``L/(pp*v)`` layers; chunk ``c`` lives on device
``c % pp``, so each device holds ``v`` non-contiguous chunks and a
microbatch's activation loops the ring ``v`` times (Megatron-style virtual
pipeline, forward schedule). Microbatch ``m`` runs chunk ``c`` at tick

    t(m, c) = (m // pp) * pp * v  +  (m % pp)  +  c

which satisfies the transfer dependency ``t(m, c+1) = t(m, c) + 1`` (so the
single per-tick ring ppermute still delivers exactly the right activation)
and provably schedules **at most one** chunk per device per tick, so one
activation buffer per device suffices. Total ticks are
``((M-1)//pp)*pp*v + (M-1)%pp + v*pp``; since a tick now costs only a
1/v-stage of compute, the pipeline-fill bubble time shrinks by ``v``:
``(pp-1) * t_stage / v`` vs GPipe's ``(pp-1) * t_stage`` (for ``M`` a
multiple of ``pp``; the idle-tick fraction is ``(pp-1)/(M*v + pp - 1)``).
The cost is ``v``x more ppermute hops of the same total byte volume, and a
static layer-axis re-gather of the parameters (device-major chunk order)
whose bytes are negligible next to a training step.

The per-layer compute reuses ``EncoderLayer.apply`` verbatim (no forked
layer math), so pipelined outputs are numerically equivalent to the
sequential stack within float32 tolerance for BOTH schedules (microbatching
changes XLA fusion boundaries, so results differ at the ~1e-6 level; the
tests assert atol/rtol 1e-5). Differentiation is plain autodiff
through ``ppermute``/``scan`` — the backward pass runs the reverse schedule
automatically.

The reference has no model-parallel story at all (DDP only,
main/train_vlp_ddp.py:215-275); this is beyond-parity scaling machinery for
deep encoder variants. For the 4-layer flagship it is a validated
capability, not a recommended deployment (dp alone is faster at this size).
"""
from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def pipeline_available(
    pipeline_stages: int, num_layers: int, interleave: int = 1
) -> bool:
    """True when an active mesh context carries a ``pp`` axis matching the
    requested stage count and the layer stack tiles over the
    ``pp * interleave`` chunks."""
    if pipeline_stages <= 1:
        return False
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape:
        return False
    v = max(1, interleave)
    return (
        mesh.shape.get("pp", 1) == pipeline_stages
        and num_layers % (pipeline_stages * v) == 0
    )


def pipeline_ticks(n_micro: int, pp: int, interleave: int = 1) -> int:
    """Total schedule ticks: the last microbatch (M-1) finishes its last
    chunk (v*pp - 1) at tick t(M-1, v*pp-1); +1 converts index to count."""
    v = max(1, interleave)
    return ((n_micro - 1) // pp) * pp * v + (n_micro - 1) % pp + v * pp


def schedule_active(t, s, *, pp: int, v: int, n_micro: int):
    """The (device ``s``, tick ``t``) -> (active?, chunk slot j, microbatch)
    mapping shared by the kernel and the schedule tests.

    Device ``s`` owns chunk slots ``j in [0, v)`` (global chunk
    ``c = s + pp*j``). Slot ``j`` is active when ``t' = t - s - pp*j``
    lands on a scheduled coordinate: ``t' >= 0``, the within-group offset
    ``t' % (pp*v)`` names a microbatch row ``r < pp``, and the decoded
    microbatch ``m = (t' // (pp*v)) * pp + r`` exists. At most one slot is
    active per (s, t) (module docstring). Works on ints and traced jnp
    scalars alike.
    """
    js = jnp.arange(v)
    tj = t - s - pp * js
    rem = tj % (pp * v)
    mj = (tj // (pp * v)) * pp + rem
    valid = (tj >= 0) & (rem < pp) & (mj < n_micro)
    j_act = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    m_act = jnp.clip(
        jnp.where(any_valid, mj[j_act], 0), 0, n_micro - 1
    )
    return any_valid, j_act, m_act


def interleave_permutation(num_layers: int, pp: int, v: int) -> np.ndarray:
    """Layer-axis permutation to device-major chunk order: device ``s``'s
    contiguous P('pp') shard becomes [chunk s, chunk s+pp, ..., chunk
    s+(v-1)*pp], each chunk ``L/(pp*v)`` consecutive canonical layers."""
    n_chunk = num_layers // (pp * v)
    perm = [
        (s + pp * j) * n_chunk + k
        for s in range(pp)
        for j in range(v)
        for k in range(n_chunk)
    ]
    return np.asarray(perm, dtype=np.int32)


def _is_stacked_layer_path(path) -> bool:
    """True when a tree path crosses the encoder's stacked-layer subtree
    (``.../layers/layer/...``) -- matches both the params tree and its
    mirrors inside optimizer state (optax mu/nu copies)."""
    keys = [getattr(p, "key", None) for p in path]
    return any(
        keys[i] == "layers" and keys[i + 1] == "layer"
        for i in range(len(keys) - 1)
    )


def permute_pipeline_params(tree, num_layers: int, pp: int, v: int,
                            inverse: bool = False):
    """Convert every stacked-layer leaf in ``tree`` between canonical layer
    order (the checkpoint / scan_layers layout) and device-major chunk order
    (the in-memory layout the interleaved pipeline consumes).

    Storing the training state pre-permuted makes the per-step pipeline path
    permutation-free: without it, the ``v>1`` layer gather runs inside the
    jitted step on P('pp')-sharded params and costs a cross-device re-gather
    of the whole encoder stack every forward (plus a scatter-add in
    backward). Elementwise optimizer updates (AdamW) commute with any fixed
    permutation, so training dynamics are unchanged; apply to params AND
    optimizer state together. ``inverse=True`` converts back (checkpoint
    save, off-mesh eval). No-op when ``v <= 1``.
    """
    if v <= 1:
        return tree
    if pp < 1 or num_layers % (pp * v) != 0:
        raise ValueError(
            f"num_layers={num_layers} must tile over pp={pp} stages x "
            f"interleave={v} chunks (a partial permutation would silently "
            f"drop layers)"
        )
    perm = interleave_permutation(num_layers, pp, v)
    if inverse:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        perm = inv

    def maybe(path, leaf):
        if (
            _is_stacked_layer_path(path)
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] == num_layers
        ):
            return leaf[perm]
        return leaf

    return jax.tree_util.tree_map_with_path(maybe, tree)


def pipeline_layers(
    stacked_params,
    x,
    key_padding_mask,
    pos,
    *,
    layer,
    n_micro: int,
    train: bool,
    rng_dropout=None,
    rng_droppath=None,
    axis: str = "pp",
    interleave: int = 1,
    pre_permuted: bool = False,
    remat: bool = False,
    collect_aux: bool = False,
):
    """Run the stacked layer pytree as a ``pp``-stage pipeline over ``x``.

    Args:
      stacked_params: pytree with leading axis ``num_layers`` on every leaf
        (the scan_layers ``layers/layer`` subtree), canonical layer order --
        or device-major chunk order when ``pre_permuted=True``.
      x: (B, T, D) token activations; B % n_micro == 0 and the microbatch
        size must tile over the mesh's dp axis.
      key_padding_mask: (B, T) float 1=valid.
      pos: (B, T, D) positional embedding added to Q/K (zeros if unused).
      layer: an unbound EncoderLayer module (its ``.apply`` is the stage
        body — the exact same code the sequential stack runs).
      n_micro: number of microbatches M. Larger M shrinks the pipeline
        bubble at the cost of smaller per-stage matmuls.
      train / rng_dropout / rng_droppath: dropout behavior; keys are folded
        per (tick, stage, slot, local-layer) so streams stay independent.
      interleave: virtual stages per device (v). v>1 runs the interleaved
        schedule (module docstring): bubble time / v, v ring loops.
      pre_permuted: the caller already stores stacked_params in device-major
        chunk order (permute_pipeline_params), so the per-step layer gather
        is skipped -- the preferred layout for v>1 training (a per-step
        cross-device re-gather of the whole stack otherwise).
      remat: rematerialize the per-tick chunk compute in the backward pass
        (jax.checkpoint around the pure layer body, collectives excluded):
        the scan-over-ticks then stores only the (mb, T, D) carry per tick
        instead of every attention/FFN intermediate -- the standard
        activation-memory discipline for pipelined long-sequence training.
      collect_aux: the layer body sows a scalar auxiliary loss into its
        "intermediates" collection (the MoE load-balance aux, ops/moe.py);
        each tick extracts it with a mutable apply, masks idle ticks, and
        accumulates it through the scan carry -- so the aux term is fully
        differentiable through the pipeline's autodiff. The returned value
        is the MEAN over (layers x microbatches x dp shards): under a
        pipeline, MoE routing (and its capacity) is per
        (microbatch x dp-shard), the same locality the microbatched loss
        terms already have.

    Returns:
      (B, T, D) encoder output, replicated over ``pp`` (psum on the last
      stage's collected microbatches) -- or a tuple
      ``(output, aux_mean)`` when ``collect_aux=True``.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        raise ValueError(
            "pipeline_layers needs an active jax.set_mesh context with a "
            f"'{axis}' axis (use parallel.make_mesh(..., pp=N))"
        )
    pp = mesh.shape[axis]
    v = max(1, interleave)
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % (pp * v) != 0:
        raise ValueError(
            f"num_layers={num_layers} must tile over pp={pp} stages x "
            f"interleave={v} chunks"
        )
    B, T, D = x.shape
    if B % n_micro != 0:
        raise ValueError(
            f"batch {B} must split into n_micro={n_micro} microbatches"
        )
    mb = B // n_micro
    dp = mesh.shape.get("dp", 1)
    if mb % dp != 0:
        raise ValueError(
            f"microbatch size {mb} (= B {B} / n_micro {n_micro}) must tile "
            f"over dp={dp}; lower n_micro or raise the batch size"
        )
    n_chunk = num_layers // (pp * v)

    if v > 1 and not pre_permuted:
        # device-major chunk order so each device's contiguous P('pp')
        # shard holds its v chunks back to back (slot-j-major). On sharded
        # params this gather is a per-step cross-device re-gather of the
        # whole stack (+ a scatter-add in backward) -- prefer storing the
        # state pre-permuted (permute_pipeline_params) and passing
        # pre_permuted=True; autodiff then never sees a permutation.
        perm = interleave_permutation(num_layers, pp, v)
        stacked_params = jax.tree_util.tree_map(
            lambda a: a[perm], stacked_params
        )

    if rng_dropout is None:
        rng_dropout = jax.random.PRNGKey(0)
    if rng_droppath is None:
        rng_droppath = jax.random.PRNGKey(0)

    # (B, ...) -> (M, mb, ...): microbatch m = rows [m*mb, (m+1)*mb)
    xm = x.reshape(n_micro, mb, T, D)
    km = key_padding_mask.reshape(n_micro, mb, T)
    pm = pos.reshape(n_micro, mb, T, D)

    fn = functools.partial(
        _pipeline_stage_fn,
        layer=layer,
        pp=pp,
        v=v,
        n_chunk=n_chunk,
        n_micro=n_micro,
        train=train,
        axis=axis,
        remat=remat,
        collect_aux=collect_aux,
    )
    # manual over (dp, pp) only: every other mesh axis (tp, ep) stays AUTO,
    # so tp-sharded stacked matrices (parallel/mesh.py pp x tp specs) keep
    # their feature-dim sharding inside the body and XLA's propagation
    # inserts the Megatron pair collectives within each stage's chunk; the
    # MoE expert axis likewise keeps its ep sharding (ops/moe.ep_constraint)
    spec_x = P(None, "dp", None, None)
    out_specs = (spec_x, P()) if collect_aux else spec_x
    out = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), spec_x, P(None, "dp", None), spec_x, P(), P()),
        out_specs=out_specs,
        axis_names=frozenset({"dp", axis}),
        check_vma=False,
    )(stacked_params, xm, km, pm, rng_dropout, rng_droppath)
    if collect_aux:
        out, aux = out
        return out.reshape(B, T, D), aux
    return out.reshape(B, T, D)


def _pipeline_stage_fn(
    params_stage, xm, km, pm, rng_dropout, rng_droppath,
    *, layer, pp, v, n_chunk, n_micro, train, axis, remat=False,
    collect_aux=False,
):
    """Per-device body: params_stage holds this device's (v * n_chunk, ...)
    layer slices in slot-major order; xm/km/pm hold the dp-local rows of
    ALL microbatches (masks and positions are replicated over pp, so no
    mask needs to travel with the activation — the schedule decodes which
    microbatch sits here each tick)."""
    s = jax.lax.axis_index(axis)
    M = n_micro

    def apply_chunk(h, kmask, posb, t, j_act):
        p_chunk = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, j_act * n_chunk, n_chunk, 0
            ),
            params_stage,
        )

        def body(carry, inp):
            p_layer, k = inp
            rngs = None
            if train:
                # unique fold per (tick, stage, slot, local layer): ticks
                # reuse (stage, slot), so all four coordinates are needed
                # for independent streams. v=1, j_act=0 reduces to the
                # GPipe fold t*(pp*n_chunk) + s*n_chunk + k.
                base = ((t * pp + s) * v + j_act) * n_chunk + k
                rngs = {
                    "dropout": jax.random.fold_in(rng_dropout, base),
                    "droppath": jax.random.fold_in(rng_droppath, base),
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
                (p_chunk, jnp.arange(n_chunk)),
            )
            return h, aux
        h, _ = jax.lax.scan(body, h, (p_chunk, jnp.arange(n_chunk)))
        return h

    if remat:
        # recompute the chunk's attention/FFN intermediates in backward from
        # the (mb, T, D) carry; the ring ppermute stays OUTSIDE the
        # checkpoint boundary so no collective is replayed
        apply_chunk = jax.checkpoint(
            apply_chunk, static_argnums=(), prevent_cse=False
        )

    def tick(carry, t):
        buf, outs, aux_acc = carry
        active, j_act, m_act = schedule_active(t, s, pp=pp, v=v, n_micro=M)
        x_t = jax.lax.dynamic_index_in_dim(xm, m_act, 0, keepdims=False)
        # chunk 0 (slot 0 on device 0) takes fresh input; every other chunk
        # consumes the ring buffer. Idle ticks run masked garbage whose
        # result is never collected and never lands on an active slot
        # (module docstring: the (s,t)->(s+1,t+1) slot map is a bijection).
        inject = jnp.logical_and(s == 0, j_act == 0)
        h = jnp.where(inject, x_t, buf)
        kmask = jax.lax.dynamic_index_in_dim(km, m_act, 0, keepdims=False)
        posb = jax.lax.dynamic_index_in_dim(pm, m_act, 0, keepdims=False)
        if collect_aux:
            h, aux_t = apply_chunk(h, kmask, posb, t, j_act)
            # idle ticks run masked garbage -- their aux must not count
            aux_acc = aux_acc + jnp.where(active, aux_t, 0.0)
        else:
            h = apply_chunk(h, kmask, posb, t, j_act)
        buf_next = jax.lax.ppermute(
            h, axis, [(i, (i + 1) % pp) for i in range(pp)]
        )
        # a microbatch completes when the LAST chunk (slot v-1 on the last
        # device) finishes
        write = active & (s == pp - 1) & (j_act == v - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outs, h.astype(outs.dtype), m_act, 0
        )
        outs = jnp.where(write, upd, outs)
        return (buf_next, outs, aux_acc), None

    buf0 = jnp.zeros(xm.shape[1:], xm.dtype)
    outs0 = jnp.zeros_like(xm)
    (_, outs, aux_acc), _ = jax.lax.scan(
        tick, (buf0, outs0, jnp.zeros((), jnp.float32)),
        jnp.arange(pipeline_ticks(M, pp, v)),
    )
    # only the last stage holds real outputs; psum replicates them over pp
    result = jax.lax.psum(
        jnp.where(s == pp - 1, outs, jnp.zeros_like(outs)), axis
    )
    if not collect_aux:
        return result
    # per-(layer x microbatch x dp-shard) aux values -> global mean; the
    # pp psum sums each device's chunks into the all-layer total
    total_layers = pp * v * n_chunk
    dp = jax.lax.psum(jnp.ones((), jnp.float32), "dp")
    aux_mean = jax.lax.psum(jax.lax.psum(aux_acc, axis), "dp") / (
        total_layers * M * dp
    )
    return result, aux_mean


_PIPELINE_FALLBACK_WARNED: set = set()


def warn_pipeline_fallback(
    pipeline_stages: int, num_layers: int, interleave: int = 1
) -> None:
    """One-shot warning when a pipeline-configured encoder runs without an
    active pp mesh (model.init, off-mesh eval) and falls back to the
    sequential scan — same UX contract as the ring/seq_shard fallbacks."""
    key = (pipeline_stages, num_layers, interleave)
    if key in _PIPELINE_FALLBACK_WARNED:
        return
    _PIPELINE_FALLBACK_WARNED.add(key)
    mesh = jax.sharding.get_abstract_mesh()
    shape = dict(mesh.shape) if mesh is not None and mesh.shape else None
    warnings.warn(
        f"pipeline_stages={pipeline_stages} configured but no matching 'pp' "
        f"mesh axis is active or the {num_layers} layers do not tile over "
        f"pp x interleave={interleave} chunks (mesh={shape}); running the "
        f"sequential scan instead. Activate with "
        f"jax.set_mesh(make_mesh(..., pp={pipeline_stages})).",
        stacklevel=3,
    )
