"""Device mesh + sharding layout.

SPMD strategy (replaces the reference's DDP/NCCL data parallelism,
main/train_vlp_ddp.py:215-275):

  * mesh axes ("dp", "pp", "tp"): batch is sharded over dp; the encoder's
    attention/FFN parameter matrices are sharded over tp (Megatron-style
    column->row pairing: in_proj/linear1 shard the output dim, out/linear2
    shard the input dim), so each tp pair needs a single all-reduce that XLA
    inserts automatically.
  * gradients: all-reduce over dp is implicit in jit'ed SPMD -- XLA emits
    the collectives over ICI.
  * per-host data sharding replaces DistributedSampler (Loader shard_index /
    num_shards).
"""
from __future__ import annotations

import re
import warnings
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _select_slice_devices(devices, per_slice: int, slices: int):
    """Pick ``per_slice`` devices from each of ``slices`` hardware slices,
    ordered slice-major. Pure (works on any objects with .slice_index/.id)
    so the layout logic is testable without multi-slice hardware. Devices
    must all report slice_index (callers check)."""
    groups: dict = {}
    for d in devices:
        groups.setdefault(d.slice_index, []).append(d)
    if len(groups) < slices:
        raise ValueError(
            f"requested slices={slices} but devices span "
            f"{len(groups)} hardware slices"
        )
    chosen = []
    for s_id in sorted(groups)[:slices]:
        g = sorted(groups[s_id], key=lambda d: d.id)
        if len(g) < per_slice:
            raise ValueError(
                f"hardware slice {s_id} has {len(g)} devices but "
                f"dp_local*tp = {per_slice} are needed per slice"
            )
        chosen.extend(g[:per_slice])
    return chosen


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
    slices: int = 1,
    pp: int = 1,
    ep: int = 1,
) -> Mesh:
    """(dp, pp[, ep], tp) device mesh; ``slices > 1`` builds a multi-slice
    (DCN) layout: devices are grouped by slice first, tp/pp/ep (and the dp
    minor) stay WITHIN a slice so tensor-parallel all-reduces,
    sequence-parallel all-gathers, pipeline activation ppermutes, and MoE
    dispatch all-to-alls ride ICI, and only the dp-major gradient
    all-reduce crosses the slower DCN links (the standard hybrid dp-over-DCN
    recipe). The "pp" axis (default size 1) drives GPipe pipeline
    parallelism (parallel/pipeline.py); "ep" (only materialized when
    ep > 1, so non-MoE configs keep the 3-axis layout) shards the MoE
    expert bank (ops/moe.py); tp sits innermost because its all-reduces
    are the heaviest collective. Every sharding rule in this module works
    unchanged on single- and multi-slice topologies."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (tp * pp * ep)
    total = dp * tp * pp * ep
    if total > n:
        raise ValueError(
            f"mesh needs dp*pp*ep*tp = {dp}*{pp}*{ep}*{tp} = {total} devices "
            f"but only {n} "
            f"are visible ({devices[0].platform if devices else 'none'}). "
            f"Reduce dp/pp/ep/tp, or expose a virtual mesh with "
            f"JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={total}."
        )
    if slices > 1:
        if dp % slices != 0:
            raise ValueError(
                f"dp={dp} must be a multiple of slices={slices}: the dp axis "
                f"is laid out slice-major so each slice holds dp/slices rows"
            )
        per_slice = (dp // slices) * tp * pp * ep
        # group by the hardware slice when the runtime reports it (real
        # multi-slice TPU) BEFORE selecting dp*tp devices, so a config that
        # uses a subset of each slice's chips is still laid out one chunk
        # per slice; virtual/CPU devices fall back to contiguous chunks
        # standing in for slices
        slice_ids = [getattr(d, "slice_index", None) for d in devices]
        if all(s is not None for s in slice_ids):
            devices = _select_slice_devices(devices, per_slice, slices)
        else:
            devices = devices[:total]
        for s in range(slices):
            chunk = devices[s * per_slice : (s + 1) * per_slice]
            ids = {i for i in (getattr(d, "slice_index", None) for d in chunk)}
            if len(ids) > 1:
                raise ValueError(
                    f"slice chunk {s} spans hardware slices {sorted(ids)}: "
                    f"pp={pp} x ep={ep} x tp={tp} x dp_local={dp // slices} "
                    f"does not fit in one slice; model parallelism must not "
                    f"cross DCN"
                )
    if ep > 1:
        grid = np.asarray(devices[:total]).reshape(dp, pp, ep, tp)
        return Mesh(grid, ("dp", "pp", "ep", "tp"))
    grid = np.asarray(devices[:total]).reshape(dp, pp, tp)
    return Mesh(grid, ("dp", "pp", "tp"))


# parameter-path regex -> PartitionSpec over the ("dp", "pp", "tp") mesh
_TP_RULES = (
    (re.compile(r"encoder/layers_\d+/in_proj_kernel$"), P(None, "tp")),
    (re.compile(r"encoder/layers_\d+/in_proj_bias$"), P("tp")),
    (re.compile(r"encoder/layers_\d+/out_kernel$"), P("tp", None)),
    (re.compile(r"encoder/layers_\d+/linear1/kernel$"), P(None, "tp")),
    (re.compile(r"encoder/layers_\d+/linear1/bias$"), P("tp")),
    (re.compile(r"encoder/layers_\d+/linear2/kernel$"), P("tp", None)),
    # scan_layers layout: same matrices with a leading stacked-layer axis
    (re.compile(r"encoder/layers/layer/in_proj_kernel$"), P(None, None, "tp")),
    (re.compile(r"encoder/layers/layer/in_proj_bias$"), P(None, "tp")),
    (re.compile(r"encoder/layers/layer/out_kernel$"), P(None, "tp", None)),
    (re.compile(r"encoder/layers/layer/linear1/kernel$"), P(None, None, "tp")),
    (re.compile(r"encoder/layers/layer/linear1/bias$"), P(None, "tp")),
    (re.compile(r"encoder/layers/layer/linear2/kernel$"), P(None, "tp", None)),
)


# MoE expert banks (ops/moe.py): expert axis over "ep", feature axes keep
# the Megatron tp sharding of the dense FFN they replace (router replicated
# -- every token needs all logits). Scan layout adds a leading layer axis.
_MOE_RULES = (
    (re.compile(r"encoder/layers_\d+/moe_w1$"), P("ep", None, "tp")),
    (re.compile(r"encoder/layers_\d+/moe_b1$"), P("ep", "tp")),
    (re.compile(r"encoder/layers_\d+/moe_w2$"), P("ep", "tp", None)),
    (re.compile(r"encoder/layers_\d+/moe_b2$"), P("ep", None)),
    (re.compile(r"encoder/layers/layer/moe_w1$"), P(None, "ep", None, "tp")),
    (re.compile(r"encoder/layers/layer/moe_b1$"), P(None, "ep", "tp")),
    (re.compile(r"encoder/layers/layer/moe_w2$"), P(None, "ep", "tp", None)),
    (re.compile(r"encoder/layers/layer/moe_b2$"), P(None, "ep", None)),
)


def _drop_axis(spec, axis: str):
    return P(*[None if a == axis else a for a in spec])


# pipeline layout: EVERY leaf under the stacked scan subtree (matrices,
# biases, norm scales) carries the layer axis first -> shard it over pp so
# each stage holds only its own layers (parallel/pipeline.py consumes the
# local slices through shard_map in_specs=P("pp")). With tp > 1 as well,
# the stacked matrices compose BOTH: P("pp") on the layer axis plus the
# Megatron tp spec on the feature dims (the scan-layout _TP_RULES already
# lead with None for the layer axis) -- the pipeline engines run tp as an
# AUTO shard_map axis, so XLA's sharding propagation inserts the Megatron
# pair collectives inside each stage's chunk.
_PP_SCAN_LEAF = re.compile(r"encoder/layers/layer/")


def _spec_for_path(
    path: str,
    pp_active: bool = False,
    tp_active: bool = False,
    ep_active: bool = False,
):
    for rule, spec in _MOE_RULES:
        if rule.search(path):
            spec = spec if ep_active else _drop_axis(spec, "ep")
            if pp_active and _PP_SCAN_LEAF.search(path):
                # MoE x pipeline: the scan layout's leading layer axis
                # shards over pp like every other stacked leaf
                spec = P("pp", *spec[1:])
            return spec
    if pp_active and _PP_SCAN_LEAF.search(path):
        if tp_active:
            for rule, spec in _TP_RULES:
                if rule.search(path):
                    return P("pp", *spec[1:])
        return P("pp")
    for rule, spec in _TP_RULES:
        if rule.search(path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings: tp-sharded encoder matrices (or pp-sharded
    -- pp x tp-sharded when both axes are active -- stacked layers when the
    mesh has a pp axis > 1), rest replicated."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    pp_active = dict(mesh.shape).get("pp", 1) > 1
    tp_active = dict(mesh.shape).get("tp", 1) > 1
    ep_active = dict(mesh.shape).get("ep", 1) > 1

    def path_str(path):
        return "/".join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )

    specs = {
        path_str(p): _spec_for_path(path_str(p), pp_active, tp_active, ep_active)
        for p, _ in flat
    }

    def assign(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(assign, params)


def replicate_params(mesh: Mesh, params):
    """Lay out params on the mesh (tp-sharded encoder matrices, rest
    replicated). Multi-process: every host holds the full params (same PRNG
    seed / restored checkpoint), so each leaf becomes a global array via
    make_array_from_process_local_data with global_shape == local shape."""
    shardings = param_shardings(mesh, params)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x, sh: jax.make_array_from_process_local_data(
                sh, np.asarray(x), global_shape=np.shape(x)
            ),
            params,
            shardings,
        )
    return jax.device_put(params, shardings)


def replicate_tree(mesh: Mesh, tree):
    """Globalize a host-identical pytree as fully-replicated global arrays
    (multi-process: optimizer state, step counters). Single-process: no-op
    (jit handles uncommitted arrays)."""
    if jax.process_count() <= 1:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), global_shape=np.shape(x)
        ),
        tree,
    )


def batch_sharding(mesh: Mesh, batch_axis: int = 0):
    return NamedSharding(mesh, P(*([None] * batch_axis + ["dp"])))


_SEQ_SKIP_WARNED: set = set()


def seq_constraint(x, axis: str = "tp"):
    """Sequence-parallel activation constraint (Megatron-SP style): shard
    the token axis of a (B, L, D) activation over `axis` for the
    elementwise/LN-heavy regions between attention blocks; XLA inserts the
    all-gathers attention needs. No-op without an active mesh context
    (jax.set_mesh) or when the axis is absent."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape or axis not in mesh.shape:
        return x
    if x.shape[0] % mesh.shape.get("dp", 1) != 0:
        # batch doesn't tile over dp (e.g. the B=2 init dummies running
        # eagerly under an active mesh) -- constraint would be invalid
        return x
    if x.shape[1] % mesh.shape[axis] != 0:  # token axis must tile evenly
        key = (x.shape[1], mesh.shape[axis])
        if key not in _SEQ_SKIP_WARNED:  # warn once per (length, shards)
            _SEQ_SKIP_WARNED.add(key)
            warnings.warn(
                f"seq_constraint skipped: token axis ({x.shape[1]}) does not "
                f"tile over {axis}={mesh.shape[axis]}; sequence parallelism "
                f"is inactive for this shape. Pad L to a multiple of "
                f"{mesh.shape[axis]} to enable it.",
                stacklevel=2,
            )
        return x
    return jax.lax.with_sharding_constraint(x, P("dp", axis, None))


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Device-put a host batch with the batch axis split over dp
    (batch_axis=1 for K-stacked scan batches).

    Multi-process: each host passes its OWN data shard (the
    DistributedSampler equivalent, train_vlp_ddp.py:112) and the global
    batch is assembled across processes -- global batch size is
    process_count * local batch size, matching the reference's per-GPU
    batch-size semantics.

    Non-array leaves (meta lists) must be stripped before calling.
    """
    sh = batch_sharding(mesh, batch_axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
