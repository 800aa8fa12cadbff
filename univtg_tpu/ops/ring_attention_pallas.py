"""Pallas RDMA ring attention: the hand-scheduled twin of ops/ring_attention.

The XLA-collective ring (ops/ring_attention.ring_attention) moves each K/V
block with ``lax.ppermute`` between scan iterations: the transfer and the
block's attention math are separate XLA ops, so on a real pod the ICI hop
serializes with the compute unless XLA's latency-hiding scheduler happens
to overlap them. This kernel owns the schedule instead:

  * each device keeps its K/V shard in a double-buffered VMEM ring
    (slot ``t % 2``) and *starts* the RDMA of the current block to its
    right neighbor (``pltpu.make_async_remote_copy`` over ICI) BEFORE
    computing that block's online-softmax partial, so the interconnect hop
    for step t+1 rides under step t's matmuls — the overlap the
    XLA-collective ring leaves on the table;
  * a counting-semaphore credit handshake makes the buffer reuse safe: a
    device may overwrite its right neighbor's slot only after the neighbor
    signals that it has finished sending *from* that slot (without this,
    step t's incoming DMA can race step t-1's outgoing read — double
    buffering alone does NOT close that window);
  * per-step ``wait_recv`` keeps the ring in lockstep with at most one
    step of skew, so the (2, ...) buffer ring never holds two live blocks
    in one slot.

The ring loop is a static Python loop over the mesh-axis size (slots and
neighbors become compile-time constants; n_dev is a mesh property, not
data). Online softmax matches the collective ring bit-for-bit in exact
arithmetic: same NEG_INF masking, same running (m, l, acc) recurrence
(tests/test_ring_attention_pallas.py pins parity in TPU interpret mode).

Scope: the kernel computes the FORWARD; a custom vjp recomputes the
backward through the differentiable XLA-collective ring (identical math,
autodiff-derived transposed permutes), so the impl is trainable.
In-kernel attention dropout is not implemented (callers fall back to the
XLA ring when dropout is active). Measuring the actual overlap win needs
a real multi-chip pod (docs/PERF.md); on this environment the kernel is
validated by interpret-mode parity on the virtual mesh and a
single-device degenerate run on the real chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30

# collective_id for get_barrier_semaphore: any value distinct from other
# collective pallas kernels in the program (this repo has only this one)
_COLLECTIVE_ID = 7


def _ring_kernel(
    q_ref, k_ref, v_ref, mask_ref, out_ref,
    kbuf, vbuf, mbuf,
    send_sem, recv_sem, cap_sem,
    *, axis: str, n_dev: int, mesh_axes: tuple,
):
    """Per-device body. q/k/v refs: (BH, L_loc, dh) with batch and heads
    collapsed into one leading dim; mask: (BH, L_loc).

    The online-softmax state (m, l, acc) lives in REGISTERS: the ring loop
    and the BH loop are both static Python loops, so the accumulators flow
    through the trace as values -- no VMEM scratch, and every arithmetic op
    is 2D per (batch x head) row exactly like the proven flash kernel
    (ops/pallas_attention.py; Mosaic's tpu.matmul supports one batch dim
    at most, and trailing size-1 lane dims crash its vector layout pass).

    kbuf/vbuf/mbuf: (2, ...) VMEM comm rings. send/recv_sem: DMA((2, 3))
    per (slot, tensor). cap_sem: REGULAR counting credit from the right
    neighbor (one credit == one free slot on its side)."""
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)

    def dev_id(target):
        # MESH-type device id: peer at index `target` along the ring axis,
        # same coordinates on every other mesh axis
        return {axis: target}

    # load the local block into ring slot 0
    kbuf[0] = k_ref[...]
    vbuf[0] = v_ref[...]
    mbuf[0] = mask_ref[...]

    if n_dev > 1:
        # entry barrier with both neighbors: nobody starts RDMA into a
        # neighbor that has not yet zeroed/loaded its buffers
        barrier = pltpu.get_barrier_semaphore()
        for nb in (left, right):
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=dev_id(nb),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
        pltpu.semaphore_wait(barrier, 2)

    BH, Lq, dh = q_ref.shape
    scale = dh**-0.5
    qh = q_ref[...].astype(jnp.float32) * scale  # (BH, Lq, dh)
    ms = [jnp.full((Lq, 1), -jnp.inf, jnp.float32) for _ in range(BH)]
    ls = [jnp.zeros((Lq, 1), jnp.float32) for _ in range(BH)]
    accs = [jnp.zeros((Lq, dh), jnp.float32) for _ in range(BH)]

    for t in range(n_dev):
        slot, nxt = t % 2, (t + 1) % 2
        rdmas = []
        if t < n_dev - 1:
            if t >= 1:
                # credit from the RIGHT neighbor: it finished sending from
                # slot `nxt` (its step t-1), so writing there is safe now
                pltpu.semaphore_wait(cap_sem, 1)
            for j, buf in enumerate((kbuf, vbuf, mbuf)):
                rdma = pltpu.make_async_remote_copy(
                    src_ref=buf.at[slot],
                    dst_ref=buf.at[nxt],
                    send_sem=send_sem.at[slot, j],
                    recv_sem=recv_sem.at[nxt, j],
                    device_id=dev_id(right),
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                rdma.start()
                rdmas.append(rdma)

        # ---- compute this block's online-softmax partial (overlaps the
        # in-flight RDMA above); 2D math per (batch x head) row ----
        kh = kbuf[slot].astype(jnp.float32)       # (BH, Lk, dh)
        vh = vbuf[slot].astype(jnp.float32)
        maskb = mbuf[slot].astype(jnp.float32)    # (BH, Lk)
        for b in range(BH):
            s = jax.lax.dot_general(
                qh[b], kh[b], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Lq, Lk)
            s = s + (1.0 - maskb[b])[None, :] * NEG_INF
            m_new = jnp.maximum(ms[b], jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(ms[b] - m_new)
            ls[b] = ls[b] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p, vh[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Lq, dh)
            accs[b] = accs[b] * alpha + pv
            ms[b] = m_new

        if t < n_dev - 1:
            for rdma in rdmas:
                rdma.wait_send()
            # our slot `slot` is free again -> one credit to the LEFT
            # neighbor (it writes our slot `slot` at its step t+1)
            pltpu.semaphore_signal(
                cap_sem, inc=1, device_id=dev_id(left),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            for rdma in rdmas:
                # step t+1's block (from the LEFT neighbor) has landed in
                # slot `nxt`; the SPMD rdma descriptor's recv_sem is ours
                rdma.wait_recv()

    if n_dev > 1:
        # drain the final credit: each device SIGNALS its left neighbor
        # n_dev-1 times (one per send) but the in-loop waits consume only
        # n_dev-2 credits (t >= 1) -- Pallas requires every semaphore back
        # at zero on kernel exit, and a stale credit would corrupt the
        # handshake of the next kernel invocation that reuses the scratch
        pltpu.semaphore_wait(cap_sem, 1)

    for b in range(BH):
        out_ref[b] = (accs[b] / jnp.maximum(ls[b], 1e-30)).astype(
            out_ref.dtype
        )


# per-device kernel size grows linearly in B*H (the kernel statically
# unrolls the per-row 2D math); past this many rows the unrolled Mosaic
# program explodes in compile time and the XLA-collective ring is the
# right tool anyway (ring attention targets FEW long sequences)
MAX_BH = 64


def ring_attention_pallas(
    q, k, v, key_padding_mask, *, num_heads: int, mesh: Mesh,
    axis: str = "sp", interpret: bool = False,
):
    """Context-parallel SDPA with a hand-scheduled RDMA ring.

    Args/semantics identical to ops/ring_attention.ring_attention (q/k/v
    (B, L, D) with L sharded over ``axis``; key_padding_mask (B, L) float
    1=valid) minus dropout. ``interpret=True`` runs the TPU interpret mode
    (pltpu.InterpretParams), which simulates the inter-device DMAs on the
    virtual CPU mesh -- how the parity tests execute it.

    Differentiable: the forward runs the RDMA kernel; the backward is a
    custom vjp that recomputes through the XLA-collective ring
    (ops/ring_attention) -- numerically the same function, with the
    transposed ppermutes autodiff derives. Requires B*num_heads <= MAX_BH
    (the kernel unrolls per-row math; beyond that use the XLA ring).
    """
    if key_padding_mask is None:
        key_padding_mask = jnp.ones(q.shape[:2], jnp.float32)
    n_dev = mesh.shape[axis]
    B, L, D = q.shape
    if L % n_dev != 0:
        raise ValueError(f"sequence {L} must tile over {axis}={n_dev}")
    H = num_heads
    if B * H > MAX_BH:
        raise ValueError(
            f"ring_attention_pallas: B*num_heads = {B * H} > {MAX_BH}; the "
            "kernel statically unrolls per-(batch x head) math and would "
            "compile-explode -- use ops/ring_attention.ring_attention for "
            "large-batch shapes (ring attention targets few LONG sequences)"
        )
    dh = D // H

    def split_heads(x):
        # (B, L, D) -> (B*H, L, dh): batch and heads collapse into ONE
        # leading dim (Mosaic's tpu.matmul supports a single batch dim)
        return (
            x.reshape(B, x.shape[1], H, dh)
            .transpose(0, 2, 1, 3)
            .reshape(B * H, x.shape[1], dh)
        )

    L_loc = L // n_dev
    BH = B * H

    kernel = functools.partial(
        _ring_kernel, axis=axis, n_dev=n_dev,
        mesh_axes=tuple(mesh.axis_names),
    )

    def per_device(qh, kh, vh, mask):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BH, L_loc, dh), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, BH, L_loc, dh), kh.dtype),   # kbuf
                pltpu.VMEM((2, BH, L_loc, dh), vh.dtype),   # vbuf
                pltpu.VMEM((2, BH, L_loc), jnp.float32),    # mbuf
                pltpu.SemaphoreType.DMA((2, 3)),            # send
                pltpu.SemaphoreType.DMA((2, 3)),            # recv
                pltpu.SemaphoreType.REGULAR,                # credit
            ],
            # collective_id registers the barrier semaphore; Mosaic rejects
            # it when the (n_dev == 1) degenerate kernel never touches one
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                **({"collective_id": _COLLECTIVE_ID} if n_dev > 1 else {}),
            ),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(qh, kh, vh, mask)

    spec3 = P(None, axis, None)

    def run_kernel(qh, kh, vh, mask):
        out = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(spec3, spec3, spec3, P(None, axis)),
            out_specs=spec3,
            check_vma=False,
        )(qh, kh, vh, mask)
        return (
            out.reshape(B, H, L, dh).transpose(0, 2, 1, 3).reshape(B, L, D)
        )

    @jax.custom_vjp
    def f(q, k, v, key_padding_mask):
        return run_kernel(
            split_heads(q), split_heads(k), split_heads(v),
            jnp.repeat(key_padding_mask.astype(jnp.float32), H, axis=0),
        )

    def f_fwd(q, k, v, key_padding_mask):
        return f(q, k, v, key_padding_mask), (q, k, v, key_padding_mask)

    def f_bwd(res, g):
        # backward recomputes through the differentiable XLA-collective
        # ring: identical math (same online-softmax recurrence, same
        # masking), so the cotangents are the kernel's own up to fp
        # rounding -- and autodiff derives the transposed ppermutes
        from univtg_tpu.ops.ring_attention import ring_attention

        q, k, v, kpm = res
        _, vjp = jax.vjp(
            lambda q, k, v: ring_attention(
                q, k, v, kpm, num_heads=num_heads, mesh=mesh, axis=axis
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, jnp.zeros_like(kpm)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, key_padding_mask)
