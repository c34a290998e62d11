"""CSR-sorted segment reductions — Pallas TPU kernel for GNN message passing.

XLA's segment_sum is a generic scatter: measured on v5e it runs ~12x off
HBM bandwidth for [8M, 128] f32 messages and ~80 ms for scalar segment ops
(the GAT softmax path), because scatter-adds serialize. The ArtGraph KG is
STATIC topology (full-batch transductive training, ref:
src/train_gnn_embeddings.py:39-52), so we can sort each relation's edges by
destination ONCE on the host and replace every scatter with a dense,
sequential-read kernel:

  * edges sorted by dst => each destination's messages are contiguous;
  * grid over output blocks of S_BLK segments; a block's edge range comes
    from a per-block CSR pointer (scalar-prefetched);
  * the kernel streams BE-edge chunks HBM->VMEM with async DMA and reduces
    each chunk with a one-hot [S_BLK, BE] @ [BE, F] matmul on the MXU —
    sums become matmuls, the op TPUs are built for;
  * GAT's softmax aggregation runs as ONE online (flash-style) pass: the
    kernel tracks each segment's running max, rescales the accumulated
    numerator/denominator by exp(m_old - m_new) per chunk, and folds the
    exp-weights into the same one-hot matmul — the EXACT per-segment
    shift at the cost of the plain weighted sum (a global shift would
    underflow cold segments' exp() to zero).

Gradients: d/d_data of a segment sum is a plain gather of the output
cotangent back to the edges — XLA gathers run at ~215 GB/s here, so the
backward pass needs no custom kernel.

Replaces the torch-scatter/PyG CUDA segment kernels the reference relies on
(SURVEY.md §2.4: "the one place a custom Pallas segment/scatter kernel is
justified").
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLK = 64   # segments per output block; 64 measured best on v5e
             # (32: 10.7, 64: 11.4, 128: pathological; M-rows of the one-hot
             # matmul double while block-boundary chunk overhead halves)
BE = 1024    # edges per DMA chunk; chunk starts are BE-aligned because 1-D
             # int32/f32 VMEM slices must align to 1024-element tiles.
             # BE=4096 measured SLOWER (9.7M edges/s): boundary chunks run
             # 4x the masked work for blocks whose edge range is ~2.5K edges


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CSR:
    """Host-precomputed sorted-edge metadata for one relation.

    Edges MUST already be sorted by destination (build_csr sorts them and
    returns the permuted edge_index alongside).
    """

    seg_local: jnp.ndarray   # [E_pad] int32: dst % S_BLK; -1 on padding
    block_ptr: jnp.ndarray   # [num_blocks+1] int32 edge offsets per block
    dst_sorted: jnp.ndarray  # [E_pad] int32 sorted dst ids; 0 on padding
    counts: jnp.ndarray      # [num_segments] f32 in-degree (for mean)
    num_segments: int        # static
    num_edges: int           # static, pre-padding

    def tree_flatten(self):
        return ((self.seg_local, self.block_ptr, self.dst_sorted,
                 self.counts),
                (self.num_segments, self.num_edges))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_blocks(self) -> int:
        return (self.num_segments + S_BLK - 1) // S_BLK


def _csr_from_sorted(ids: np.ndarray, num_segments: int,
                     as_numpy: bool = False) -> CSR:
    """Kernel metadata for an already nondecreasing segment-id array.

    ids equal to num_segments are SENTINEL padding edges (the edge-sharded
    path pads every shard to a uniform size with dst=num_dst, mirroring the
    XLA path's out-of-range-scatter drop): they are excluded from the
    forward reduction (seg_local=-1) and from counts, and keep their
    sentinel value in dst_sorted so the backward passes can mask them.

    as_numpy keeps the metadata on the host (numpy leaves) for callers that
    post-process before a single device_put (the sharded stacker) — the
    default commits each array to the default device, which single-device
    callers reuse across every jitted step.
    """
    e = ids.shape[0]
    ids = ids.astype(np.int64)
    valid = ids < num_segments
    num_blocks = (num_segments + S_BLK - 1) // S_BLK
    # row_ptr at block granularity only (fits scalar-prefetch memory)
    boundaries = np.arange(num_blocks + 1, dtype=np.int64) * S_BLK
    block_ptr = np.searchsorted(ids, boundaries, side="left").astype(np.int32)

    # pad the edge arrays to whole BE-aligned chunks
    e_pad = ((e + BE - 1) // BE) * BE
    seg_local = np.full(e_pad, -1, np.int32)
    seg_local[:e] = np.where(valid, ids % S_BLK, -1).astype(np.int32)
    dst_sorted = np.zeros(e_pad, np.int32)
    dst_sorted[:e] = ids

    counts = np.bincount(ids[valid], minlength=num_segments).astype(np.float32)

    conv = (lambda a: a) if as_numpy else jnp.asarray
    return CSR(
        seg_local=conv(seg_local),
        block_ptr=conv(block_ptr),
        dst_sorted=conv(dst_sorted),
        counts=conv(counts),
        num_segments=int(num_segments),
        num_edges=int(e),
    )


def build_csr(edge_index: np.ndarray, num_segments: int,
              as_numpy: bool = False) -> Tuple[np.ndarray, CSR]:
    """Sort edges by dst and build kernel metadata.

    Returns (sorted_edge_index [2, E], csr). The caller must use the sorted
    edge_index together with the csr (src rows are permuted identically).
    """
    edge_index = np.asarray(edge_index)
    order = np.argsort(edge_index[1], kind="stable")
    sorted_edges = np.ascontiguousarray(edge_index[:, order]).astype(np.int32)
    return sorted_edges, _csr_from_sorted(sorted_edges[1], num_segments,
                                          as_numpy=as_numpy)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EdgeCSR:
    """Both directions of one relation's sorted-edge metadata.

    `dst` drives the forward segment reductions; `src` + `src_perm` drive
    the BACKWARD of the h_src[src] gathers (a scatter-add by src in plain
    XLA — the same serialization the forward kernel removes).
    """

    dst: CSR
    src: CSR
    src_perm: jnp.ndarray  # [E] int32: dst-order edge position per src rank
    src_ids: jnp.ndarray   # [E] int32: src node per dst-ordered edge

    def tree_flatten(self):
        return ((self.dst, self.src, self.src_perm, self.src_ids), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_edge_csr(edge_index: np.ndarray, num_src: int, num_dst: int,
                   as_numpy: bool = False) -> Tuple[np.ndarray, EdgeCSR]:
    sorted_edges, dst_csr = build_csr(edge_index, num_dst, as_numpy=as_numpy)
    src_ids = sorted_edges[0]
    order = np.argsort(src_ids, kind="stable").astype(np.int32)
    src_csr = _csr_from_sorted(src_ids[order], num_src, as_numpy=as_numpy)
    conv = (lambda a: a) if as_numpy else jnp.asarray
    return sorted_edges, EdgeCSR(
        dst=dst_csr, src=src_csr,
        src_perm=conv(order),
        src_ids=conv(src_ids))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _member(seg, e_start, e_end, start):
    """[S_BLK, BE] boolean membership matrix for a chunk, masked to the
    block's edge range (chunk windows are BE-aligned, may overhang both
    ends; seg_local==-1 padding/sentinel entries match no row)."""
    epos = start + jax.lax.broadcasted_iota(jnp.int32, (BE,), 0)
    inside = (epos >= e_start) & (epos < e_end)
    return ((jax.lax.broadcasted_iota(jnp.int32, (S_BLK, BE), 0)
             == seg[None, :]) & inside[None, :])


def _onehot(seg, e_start, e_end, start):
    return _member(seg, e_start, e_end, start).astype(jnp.float32)


def _double_buffered(num_chunks, base, streams, compute):
    """Run `compute(k, slot)` over chunks with double-buffered DMA.

    streams: list of (hbm_ref, vmem_ref[2, ...], sem[2]) — chunk k of each
    stream is copied into slot k%2 one iteration ahead of its use.
    """
    def copies(k, slot):
        # double buffers are flattened to 2*BE along dim 0 (a leading size-2
        # dim cannot be sliced under VMEM tiling); slot offsets 0/BE are
        # tile-aligned
        start = base + k * BE
        off = slot * BE
        out = []
        for hbm, vmem, sem in streams:
            if hbm.ndim == 2:
                src = hbm.at[pl.ds(start, BE), :]
                dst = vmem.at[pl.ds(off, BE), :]
            else:
                src = hbm.at[pl.ds(start, BE)]
                dst = vmem.at[pl.ds(off, BE)]
            out.append(pltpu.make_async_copy(src, dst, sem.at[slot]))
        return out

    @pl.when(num_chunks > 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < num_chunks)
        def _():
            for cp in copies(k + 1, jax.lax.rem(k + 1, 2)):
                cp.start()

        for cp in copies(k, slot):
            cp.wait()
        compute(k, slot)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)


def _sum_kernel(block_ptr_ref, data_hbm, seg_hbm, out_ref,
                data_vmem, seg_vmem, acc_ref, sem_d, sem_s):
    b = pl.program_id(0)
    e_start = block_ptr_ref[b]
    e_end = block_ptr_ref[b + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    # chunk starts are BE-aligned (VMEM 1-D slice tiling); edges of
    # neighboring blocks inside the window are masked out by position
    base = (e_start // BE) * BE
    num_chunks = pl.cdiv(e_end - base, BE)

    def compute(k, slot):
        off = slot * BE
        onehot = _onehot(seg_vmem[pl.ds(off, BE)], e_start, e_end,
                         base + k * BE)
        acc_ref[:] += jax.lax.dot(
            onehot, data_vmem[pl.ds(off, BE), :].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    _double_buffered(num_chunks, base,
                     [(data_hbm, data_vmem, sem_d),
                      (seg_hbm, seg_vmem, sem_s)], compute)
    out_ref[:] = acc_ref[:]


def _weighted_kernel(block_ptr_ref, data_hbm, w_hbm, seg_hbm,
                     out_ref, outw_ref,
                     data_vmem, w_vmem, seg_vmem, acc_ref, accw_ref,
                     sem_d, sem_w, sem_s):
    b = pl.program_id(0)
    e_start = block_ptr_ref[b]
    e_end = block_ptr_ref[b + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    accw_ref[:] = jnp.zeros_like(accw_ref)
    base = (e_start // BE) * BE
    num_chunks = pl.cdiv(e_end - base, BE)

    def compute(k, slot):
        off = slot * BE
        onehot = _onehot(seg_vmem[pl.ds(off, BE)], e_start, e_end,
                         base + k * BE)
        # fold the edge weight into the one-hot: one matmul gives sum(w*m),
        # a row-sum of the same weighted one-hot gives sum(w) for free
        wo = onehot * w_vmem[pl.ds(off, BE)][None, :]
        acc_ref[:] += jax.lax.dot(
            wo, data_vmem[pl.ds(off, BE), :].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        accw_ref[:] += jnp.sum(wo, axis=1, keepdims=True)

    _double_buffered(num_chunks, base,
                     [(data_hbm, data_vmem, sem_d),
                      (w_hbm, w_vmem, sem_w),
                      (seg_hbm, seg_vmem, sem_s)], compute)
    out_ref[:] = acc_ref[:]
    outw_ref[:] = accw_ref[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pallas_sum(data, csr: CSR):
    nb = csr.num_blocks
    n_pad = nb * S_BLK
    f = data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((S_BLK, f), lambda b, bp: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * BE, f), data.dtype),
            pltpu.VMEM((2 * BE,), jnp.int32),
            pltpu.VMEM((S_BLK, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _sum_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(csr.block_ptr, data, csr.seg_local)
    return out[:csr.num_segments]


def _pallas_weighted(data, w, csr: CSR):
    nb = csr.num_blocks
    n_pad = nb * S_BLK
    f = data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((S_BLK, f), lambda b, bp: (b, 0)),
                   pl.BlockSpec((S_BLK, 1), lambda b, bp: (b, 0))],
        scratch_shapes=[
            pltpu.VMEM((2 * BE, f), data.dtype),
            pltpu.VMEM((2 * BE,), jnp.float32),
            pltpu.VMEM((2 * BE,), jnp.int32),
            pltpu.VMEM((S_BLK, f), jnp.float32),
            pltpu.VMEM((S_BLK, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, outw = pl.pallas_call(
        _weighted_kernel,
        out_shape=[jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(csr.block_ptr, data, w, csr.seg_local)
    return out[:csr.num_segments], outw[:csr.num_segments, 0]


def _softmax_kernel(block_ptr_ref, data_hbm, logit_hbm, seg_hbm,
                    out_ref, outm_ref, outd_ref,
                    data_vmem, logit_vmem, seg_vmem,
                    acc_ref, m_ref, den_ref, sem_d, sem_w, sem_s):
    """Online (flash-style) per-segment softmax aggregation in ONE pass:

      out[s]  = sum_e exp(l_e - m_s) * data_e / sum_e exp(l_e - m_s)
      m_s     = max of segment s's logits (tracked online)

    Per chunk the running maximum m is raised, the accumulated numerator/
    denominator rescale by exp(m_old - m_new), and the chunk's exp-weights
    fold into the same one-hot matmul as the plain weighted kernel — the
    exact shift costs no extra pass over the edges. m and den are emitted
    for the backward pass (p_e reconstructs from them by gathers)."""
    b = pl.program_id(0)
    e_start = block_ptr_ref[b]
    e_end = block_ptr_ref[b + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
    den_ref[:] = jnp.zeros_like(den_ref)
    base = (e_start // BE) * BE
    num_chunks = pl.cdiv(e_end - base, BE)

    def compute(k, slot):
        off = slot * BE
        member = _member(seg_vmem[pl.ds(off, BE)], e_start, e_end,
                         base + k * BE)
        onehot = member.astype(jnp.float32)
        logits = logit_vmem[pl.ds(off, BE)][None, :]          # [1, BE]
        masked = jnp.where(member, logits, -jnp.inf)           # [S_BLK, BE]
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(masked, axis=1, keepdims=True))
        # empty-so-far segments keep m=-inf; exp against a 0 shift avoids
        # the nan of exp(-inf - -inf) / 0*inf (their weights mask to 0)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        scale = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_safe), 0.0)
        # per-edge shift via a tiny one-hot matmul, then ONE [1, BE] exp —
        # exponentiating the full [S_BLK, BE] matrix costs S_BLK x the
        # transcendental work for the same result. Valid edges always have
        # logit <= their segment max, so the min(., 0) clamp only tames
        # out-of-block lanes (whose m_edge is 0) before the mask zeroes them.
        m_edge = jax.lax.dot(m_safe.reshape(1, S_BLK), onehot,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        w_vec = jnp.exp(jnp.minimum(logits - m_edge, 0.0))     # [1, BE]
        wo = onehot * w_vec
        acc_ref[:] = acc_ref[:] * scale + jax.lax.dot(
            wo, data_vmem[pl.ds(off, BE), :].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        den_ref[:] = den_ref[:] * scale + jnp.sum(wo, axis=1, keepdims=True)
        m_ref[:] = m_new

    _double_buffered(num_chunks, base,
                     [(data_hbm, data_vmem, sem_d),
                      (logit_hbm, logit_vmem, sem_w),
                      (seg_hbm, seg_vmem, sem_s)], compute)
    out_ref[:] = acc_ref[:]
    outm_ref[:] = m_ref[:]
    outd_ref[:] = den_ref[:]


def _pallas_softmax(data, logits, csr: CSR):
    nb = csr.num_blocks
    n_pad = nb * S_BLK
    f = data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((S_BLK, f), lambda b, bp: (b, 0)),
                   pl.BlockSpec((S_BLK, 1), lambda b, bp: (b, 0)),
                   pl.BlockSpec((S_BLK, 1), lambda b, bp: (b, 0))],
        scratch_shapes=[
            pltpu.VMEM((2 * BE, f), data.dtype),
            pltpu.VMEM((2 * BE,), jnp.float32),
            pltpu.VMEM((2 * BE,), jnp.int32),
            pltpu.VMEM((S_BLK, f), jnp.float32),
            pltpu.VMEM((S_BLK, 1), jnp.float32),
            pltpu.VMEM((S_BLK, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, m, den = pl.pallas_call(
        _softmax_kernel,
        out_shape=[jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(csr.block_ptr, data, logits, csr.seg_local)
    return (out[:csr.num_segments], m[:csr.num_segments, 0],
            den[:csr.num_segments, 0])


def _scalar_kernel(block_ptr_ref, w_hbm, seg_hbm, out_ref,
                   w_vmem, seg_vmem, acc_ref, sem_w, sem_s):
    """Per-segment sum of a scalar edge array (VPU only, no feature DMA)."""
    b = pl.program_id(0)
    e_start = block_ptr_ref[b]
    e_end = block_ptr_ref[b + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    base = (e_start // BE) * BE
    num_chunks = pl.cdiv(e_end - base, BE)

    def compute(k, slot):
        off = slot * BE
        onehot = _onehot(seg_vmem[pl.ds(off, BE)], e_start, e_end,
                         base + k * BE)
        acc_ref[:] += jnp.sum(onehot * w_vmem[pl.ds(off, BE)][None, :],
                              axis=1, keepdims=True)

    _double_buffered(num_chunks, base,
                     [(w_hbm, w_vmem, sem_w),
                      (seg_hbm, seg_vmem, sem_s)], compute)
    out_ref[:] = acc_ref[:]


def _pallas_scalar_call(kernel, w, csr: CSR):
    nb = csr.num_blocks
    n_pad = nb * S_BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((S_BLK, 1), lambda b, bp: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * BE,), jnp.float32),
            pltpu.VMEM((2 * BE,), jnp.int32),
            pltpu.VMEM((S_BLK, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(csr.block_ptr, w, csr.seg_local)
    return out[:csr.num_segments, 0]


def _pallas_scalar(w, csr: CSR):
    return _pallas_scalar_call(_scalar_kernel, w, csr)


# ---------------------------------------------------------------------------
# Differentiable public API
# ---------------------------------------------------------------------------

def _pad_edges(x, csr: CSR):
    """Pad edge-major arrays to the kernel's padded edge count."""
    e_pad = csr.seg_local.shape[0]
    pad = e_pad - x.shape[0]
    if pad <= 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _pad_features(x):
    """Pad the feature (lane) dim to a 128 multiple (VMEM tiling)."""
    f = x.shape[1]
    f_pad = ((f + 127) // 128) * 128
    if f_pad != f:
        x = jnp.pad(x, ((0, 0), (0, f_pad - f)))
    return x, f


@jax.custom_vjp
def _csr_segment_sum(data, csr: CSR):
    padded, f = _pad_features(_pad_edges(data, csr))
    return _pallas_sum(padded, csr)[:, :f]


def csr_segment_sum(data, csr: CSR, axis_name: str = None):
    """sum of data rows per destination segment; data is edge-major in the
    csr's sorted order, [E or E_pad, F] -> [num_segments, F] f32.

    With axis_name (edge-sharded shard_map), the per-shard partial sums
    psum-combine over the mesh axis."""
    out = _csr_segment_sum(data, csr)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def _sum_fwd(data, csr):
    # scalar dtype witness: dtype objects are not valid residual leaves,
    # and zero-length residuals break shard_map's bwd sharding inference
    return _csr_segment_sum(data, csr), (csr, data.shape[0],
                                         jnp.zeros((), data.dtype))


def _edge_cotangent(g, csr, e):
    """Gather output cotangents back to (sorted) edges, zeroing sentinel
    padding edges (dst == num_segments, see _csr_from_sorted)."""
    ids = csr.dst_sorted[:e]
    valid = ids < csr.num_segments
    grad = g[jnp.minimum(ids, csr.num_segments - 1)]
    if grad.ndim == 1:
        return jnp.where(valid, grad, 0.0)
    return grad * valid[:, None].astype(grad.dtype)


def _sum_bwd(res, g):
    csr, e, wit = res
    return _edge_cotangent(g, csr, e).astype(wit.dtype), None


_csr_segment_sum.defvjp(_sum_fwd, _sum_bwd)


@jax.custom_vjp
def csr_weighted_segment_sum(data, w, csr: CSR):
    """(sum of w*data per segment, sum of w per segment).

    The GAT fusion: numerator and softmax denominator in one kernel pass.
    """
    padded, f = _pad_features(_pad_edges(data, csr))
    num, den = _pallas_weighted(padded, _pad_edges(w, csr), csr)
    return num[:, :f], den


def _wsum_fwd(data, w, csr):
    return csr_weighted_segment_sum(data, w, csr), (data, w, csr)


def _wsum_bwd(res, cots):
    data, w, csr = res
    g_out, g_w = cots
    e = data.shape[0]
    g_edge = _edge_cotangent(g_out, csr, e)   # [E, F], sentinels zeroed
    d_data = w[:, None] * g_edge
    d_w = jnp.sum(data.astype(jnp.float32) * g_edge, axis=-1) \
        + _edge_cotangent(g_w, csr, e)
    return d_data.astype(data.dtype), d_w.astype(w.dtype), None


csr_weighted_segment_sum.defvjp(_wsum_fwd, _wsum_bwd)


@jax.custom_vjp
def csr_scalar_segment_sum(w, csr: CSR):
    """Per-segment sum of a scalar edge array, [E] -> [num_segments]."""
    return _pallas_scalar(_pad_edges(w.astype(jnp.float32), csr), csr)


def _ssum_fwd(w, csr):
    return csr_scalar_segment_sum(w, csr), (csr, w.shape[0],
                                            jnp.zeros((), w.dtype))


def _ssum_bwd(res, g):
    csr, e, wit = res
    return _edge_cotangent(g, csr, e).astype(wit.dtype), None


csr_scalar_segment_sum.defvjp(_ssum_fwd, _ssum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def csr_gather(x, ecsr: EdgeCSR, axis: str):
    """x[edge endpoint ids] with a kernel-backed backward.

    axis='src': gather node rows (or scalars) to edges by source id; the
    VJP is a segment sum by src — served by the src-sorted CSR kernel
    instead of an XLA scatter. axis='dst': same with the dst-sorted CSR
    (edges are already in dst order, no permutation needed).
    """
    e = ecsr.dst.num_edges
    ids = ecsr.src_ids if axis == "src" else ecsr.dst.dst_sorted[:e]
    return x[jnp.minimum(ids, x.shape[0] - 1)]


def _gather_fwd(x, ecsr, axis):
    return csr_gather(x, ecsr, axis), (ecsr, x.shape[0],
                                       jnp.zeros((), x.dtype))


def _gather_bwd(axis, res, g):
    ecsr, n, wit = res
    if axis == "src":
        g = g[ecsr.src_perm]  # reorder cotangents into src-sorted order
        csr = ecsr.src
    else:
        csr = ecsr.dst
    if g.ndim == 1:
        d_x = csr_scalar_segment_sum(g, csr)
    else:
        d_x = csr_segment_sum(g, csr)
    return d_x[:n].astype(wit.dtype), None


csr_gather.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def _csr_softmax_raw(messages, logits, csr: CSR):
    """One-pass online-softmax aggregation (kernel): returns the
    UNNORMALIZED (numerator [S, F], per-segment max m [S], denominator
    den [S]) so callers can cross-shard-combine before dividing.

    m's cotangent is discarded (the softmax shift is detached, matching
    torch_geometric's softmax)."""
    padded, f = _pad_features(_pad_edges(messages, csr))
    num, m, den = _pallas_softmax(
        padded, _pad_edges(logits.astype(jnp.float32), csr), csr)
    return num[:, :f], m, den


def _softmax_raw_fwd(messages, logits, csr):
    num, m, den = _csr_softmax_raw(messages, logits, csr)
    return (num, m, den), (messages, logits, csr, m)


def _softmax_raw_bwd(res, cots):
    messages, logits, csr, m = res
    g_num, _g_m, g_den = cots
    e = messages.shape[0]
    ids = jnp.minimum(csr.dst_sorted[:e], csr.num_segments - 1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    # valid edges have logit <= their segment max; the clamp only tames
    # SENTINEL edges (clamped ids point at a foreign segment, where exp
    # could overflow to inf and turn 0-cotangents into NaN)
    w = jnp.exp(jnp.minimum(logits.astype(jnp.float32) - m_safe[ids], 0.0))
    gn_e = _edge_cotangent(g_num, csr, e)   # [E, F], sentinels zeroed
    gd_e = _edge_cotangent(g_den, csr, e)   # [E]
    d_messages = w[:, None] * gn_e
    d_logits = w * (jnp.sum(messages.astype(jnp.float32) * gn_e, axis=-1)
                    + gd_e)
    return d_messages.astype(messages.dtype), d_logits.astype(logits.dtype), None


_csr_softmax_raw.defvjp(_softmax_raw_fwd, _softmax_raw_bwd)


def csr_segment_mean(data, csr: CSR, axis_name: str = None):
    """Per-segment mean. With axis_name (edge-sharded shard_map), local
    partial sums and in-degree counts are psum-combined over the mesh axis
    so the mean normalizes over ALL of a node's incoming edges."""
    totals = csr_segment_sum(data, csr, axis_name)
    counts = csr.counts
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    return totals / jnp.maximum(counts, 1.0)[:, None]


def csr_attention_aggregate(messages, logits, csr: CSR, eps: float = 1e-16,
                            axis_name: str = None):
    """GAT aggregation: softmax(logits per segment)-weighted message sum.

    Identical math to segment_softmax + segment_sum, with the EXACT
    per-segment max shift computed ONLINE inside the one-pass kernel
    (_softmax_kernel; a single global max would underflow exp() to zero
    for destinations whose logits sit ~88 below the hottest edge,
    silently zeroing those nodes' outputs and gradients):
      out[s] = sum_e w_e * m_e / sum_e w_e,
      w_e = exp(logit_e - max_{e' in seg(e)} logit_{e'})

    With axis_name (edge-sharded shard_map): per-shard segment maxima
    pmax-combine, each shard's numerator/denominator rescale by
    exp(m_shard - m_global) and psum — attention normalizes over ALL
    incoming edges while each device only reduces its local edge shard.
    """
    num, m, den = _csr_softmax_raw(messages, logits, csr)
    if axis_name is not None:
        m = jax.lax.stop_gradient(m)
        m_g = jax.lax.pmax(m, axis_name)
        r = jnp.where(jnp.isfinite(m),
                      jnp.exp(m - jnp.where(jnp.isfinite(m_g), m_g, 0.0)),
                      0.0)
        num = jax.lax.psum(num * r[:, None], axis_name)
        den = jax.lax.psum(den * r, axis_name)
    return num / jnp.maximum(den, eps)[:, None]


def build_csr_dict(edges: Dict, num_nodes: Dict) -> Tuple[Dict, Dict]:
    """Sort every relation's edges and build its EdgeCSR (both directions).
    Returns (sorted_edges_dict, csr_dict) for HeteroGraph-style edge dicts
    keyed by (src_type, rel, dst_type)."""
    sorted_edges, csrs = {}, {}
    for (s, r, t), ei in edges.items():
        se, ecsr = build_edge_csr(ei, num_nodes[s], num_nodes[t])
        sorted_edges[(s, r, t)] = se
        csrs[(s, r, t)] = ecsr
    return sorted_edges, csrs
