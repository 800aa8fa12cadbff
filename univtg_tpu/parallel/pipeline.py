"""GPipe-style pipeline parallelism over the encoder layer stack.

The scan-layers parameter layout (``encoder/layers/layer/*`` with a leading
layer axis, models/encoder.py) is already the layout pipeline parallelism
wants: shard that leading axis over a ``pp`` mesh axis so each device holds
``num_layers / pp`` consecutive layers, split the batch into microbatches,
and stream activations stage-to-stage with ``lax.ppermute``. Checkpoints
are interchangeable with scan_layers — no conversion needed.

Execution model (classic GPipe schedule, expressed as one ``lax.scan`` over
ticks inside a ``shard_map``):

  tick t: stage ``s`` applies its local layers to microbatch ``t - s``
          (stage 0 injects fresh microbatch ``t``), then ppermutes its
          activation to stage ``s+1``. After ``M + pp - 1`` ticks all ``M``
          microbatches have drained; the bubble fraction is
          ``(pp-1)/(M+pp-1)``.

The per-layer compute reuses ``EncoderLayer.apply`` verbatim (no forked
layer math), so pipelined outputs are bit-identical to the sequential stack
in deterministic mode. Differentiation is plain autodiff through
``ppermute``/``scan`` — the backward pass runs the reverse schedule
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
from jax.sharding import PartitionSpec as P


def pipeline_available(pipeline_stages: int, num_layers: int) -> bool:
    """True when an active mesh context carries a ``pp`` axis matching the
    requested stage count and the layer stack tiles over it."""
    if pipeline_stages <= 1:
        return False
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape:
        return False
    return (
        mesh.shape.get("pp", 1) == pipeline_stages
        and num_layers % pipeline_stages == 0
    )


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
):
    """Run the stacked layer pytree as a ``pp``-stage pipeline over ``x``.

    Args:
      stacked_params: pytree with leading axis ``num_layers`` on every leaf
        (the scan_layers ``layers/layer`` subtree).
      x: (B, T, D) token activations; B % n_micro == 0 and the microbatch
        size must tile over the mesh's dp axis.
      key_padding_mask: (B, T) float 1=valid.
      pos: (B, T, D) positional embedding added to Q/K (zeros if unused).
      layer: an unbound EncoderLayer module (its ``.apply`` is the stage
        body — the exact same code the sequential stack runs).
      n_micro: number of microbatches M. Larger M shrinks the pipeline
        bubble (pp-1)/(M+pp-1) at the cost of smaller per-stage matmuls.
      train / rng_dropout / rng_droppath: dropout behavior; keys are folded
        per (tick, stage, local-layer) so streams stay independent.

    Returns:
      (B, T, D) encoder output, replicated over ``pp`` (psum on the last
      stage's collected microbatches).
    """
    from jax.experimental.shard_map import shard_map

    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        raise ValueError(
            "pipeline_layers needs an active jax.set_mesh context with a "
            f"'{axis}' axis (use parallel.make_mesh(..., pp=N))"
        )
    pp = mesh.shape[axis]
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % pp != 0:
        raise ValueError(
            f"num_layers={num_layers} must tile over pp={pp} stages"
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
    n_local = num_layers // pp

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
        n_local=n_local,
        n_micro=n_micro,
        train=train,
        axis=axis,
    )
    spec_x = P(None, "dp", None, None)
    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), spec_x, P(None, "dp", None), spec_x, P(), P()),
        out_specs=spec_x,
        check_rep=False,
    )(stacked_params, xm, km, pm, rng_dropout, rng_droppath)
    return out.reshape(B, T, D)


def _pipeline_stage_fn(
    params_stage, xm, km, pm, rng_dropout, rng_droppath,
    *, layer, pp, n_local, n_micro, train, axis,
):
    """Per-device body: params_stage holds this stage's (n_local, ...) layer
    slices; xm/km/pm hold the dp-local rows of ALL microbatches (masks and
    positions are replicated over pp, so no mask needs to travel with the
    activation — stage s just indexes microbatch t-s)."""
    s = jax.lax.axis_index(axis)
    M = n_micro

    def apply_local_layers(h, kmask, posb, tick):
        def body(carry, inp):
            p_layer, j = inp
            rngs = None
            if train:
                # unique fold per (tick, stage, local layer): ticks reuse
                # stages, so all three coordinates are needed for
                # independent streams
                base = tick * (pp * n_local) + s * n_local + j
                rngs = {
                    "dropout": jax.random.fold_in(rng_dropout, base),
                    "droppath": jax.random.fold_in(rng_droppath, base),
                }
            h = layer.apply(
                {"params": p_layer}, carry, kmask, posb, train=train,
                rngs=rngs,
            )
            return h, None
        h, _ = jax.lax.scan(
            body, h, (params_stage, jnp.arange(n_local))
        )
        return h

    def tick(carry, t):
        buf, outs = carry
        # stage 0 injects fresh microbatch t (clamped reads during the
        # drain phase are never collected)
        x_t = jax.lax.dynamic_index_in_dim(
            xm, jnp.clip(t, 0, M - 1), 0, keepdims=False
        )
        h = jnp.where(s == 0, x_t, buf)
        # the microbatch CURRENTLY at stage s is t - s
        m_cur = jnp.clip(t - s, 0, M - 1)
        kmask = jax.lax.dynamic_index_in_dim(km, m_cur, 0, keepdims=False)
        posb = jax.lax.dynamic_index_in_dim(pm, m_cur, 0, keepdims=False)
        h = apply_local_layers(h, kmask, posb, t)
        buf_next = jax.lax.ppermute(
            h, axis, [(i, (i + 1) % pp) for i in range(pp)]
        )
        out_idx = t - (pp - 1)
        write = jnp.logical_and(s == pp - 1, out_idx >= 0)
        upd = jax.lax.dynamic_update_index_in_dim(
            outs, h.astype(outs.dtype), jnp.clip(out_idx, 0, M - 1), 0
        )
        outs = jnp.where(write, upd, outs)
        return (buf_next, outs), None

    buf0 = jnp.zeros(xm.shape[1:], xm.dtype)
    outs0 = jnp.zeros_like(xm)
    (_, outs), _ = jax.lax.scan(
        tick, (buf0, outs0), jnp.arange(M + pp - 1)
    )
    # only the last stage holds real outputs; psum replicates them over pp
    return jax.lax.psum(
        jnp.where(s == pp - 1, outs, jnp.zeros_like(outs)), axis
    )


_PIPELINE_FALLBACK_WARNED: set = set()


def warn_pipeline_fallback(pipeline_stages: int, num_layers: int) -> None:
    """One-shot warning when a pipeline-configured encoder runs without an
    active pp mesh (model.init, off-mesh eval) and falls back to the
    sequential scan — same UX contract as the ring/seq_shard fallbacks."""
    key = (pipeline_stages, num_layers)
    if key in _PIPELINE_FALLBACK_WARNED:
        return
    _PIPELINE_FALLBACK_WARNED.add(key)
    mesh = jax.sharding.get_abstract_mesh()
    shape = dict(mesh.shape) if mesh is not None and mesh.shape else None
    warnings.warn(
        f"pipeline_stages={pipeline_stages} configured but no matching 'pp' "
        f"mesh axis is active (mesh={shape}, num_layers={num_layers}); "
        f"running the sequential scan instead. Activate with "
        f"jax.set_mesh(make_mesh(..., pp={pipeline_stages})).",
        stacklevel=3,
    )
