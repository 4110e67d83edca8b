"""Single-pass full-KV self-attention for mid-length sequences.

The flagship UNet's spatial self-attention runs at three sequence lengths
(576x1024 input -> latent 72x128): S=9216 (ds1), S=2304 (ds2), S=576 (ds4),
all with head_dim 64 (lvdm/modules/attention.py:66-67 routes these through
xformers on CUDA). At S<=9216 and D=64 the ENTIRE K and V for one (batch,
head) are at most 2 x 1.2 MB of bf16 — they fit in VMEM with room to spare,
so the online-softmax machinery of flash attention (running max/sum
corrections, m/l scratch traffic, one grid step per KV block) is pure
overhead: measured 34.4 ms at the ds2 site where this kernel's single pass
needs ~7 ms, and the XLA einsum path at ds4 bounces (B,H,S,S) logits through
HBM (13.6 ms vs ~3 ms here).

Design: grid (B, H, S/block_q); K and V are indexed invariantly over the
q-block axis so Pallas keeps them resident in VMEM across the inner grid
steps; each program computes one (block_q, S) logits tile in fp32 —
max-subtract, exp, row-sum (exactly one VPU sweep each), then P@V on the MXU
with the 1/rowsum folded into the small (block_q, D) output instead of the
big probability matrix. The d**-0.5 scale is folded into q outside the
kernel (exact for power-of-two D: exponent-only scaling commutes with the
matmul bitwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]  # (sb, D)
    k = k_ref[0, 0]  # (S, D)
    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (sb, S) — scale AND log2(e) pre-folded into q: logits are base-2
    m = jnp.max(logits, axis=-1, keepdims=True)
    # exp2 instead of exp: exp(x) lowers to exp2(x*log2e) on the VPU, so the
    # pre-folded log2e saves one full multiply pass over the (sb, S) tile
    e = jnp.exp2(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = lax.dot_general(
        e.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (sb, D)
    o_ref[0, 0] = (out / s).astype(o_ref.dtype)


def _kernel_chunked(q_ref, k_ref, v_ref, o_ref, *, n_chunks: int):
    """Online-softmax over n_chunks statically-unrolled KV chunks (K/V still
    fully VMEM-resident — no DMA machinery). The single-pass kernel runs one
    giant MXU matmul, then a serialized VPU softmax sweep over the whole
    (sb, S) tile, then the PV matmul: MXU and VPU strictly alternate. Chunking
    gives the Mosaic scheduler independent work to interleave — chunk i+1's
    QK^T (MXU) issues while chunk i's exp2/rowsum (VPU) drains — and shrinks
    the fp32 logits footprint from (sb, S) to (sb, S/n_chunks), so larger q
    blocks fit VMEM. The m/l/acc running corrections touch only (sb, 1) and
    (sb, D) tiles: VPU-negligible. Exact same math as _kernel (the final
    rescale telescopes identically; base-2 exponentials, scale pre-folded
    into q)."""
    q = q_ref[0, 0]                       # (sb, D)
    k = k_ref[0, 0]                       # (S, D)
    v = v_ref[0, 0]
    s_total = k.shape[0]
    c = s_total // n_chunks
    sb = q.shape[0]

    m = jnp.full((sb, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((sb, 1), jnp.float32)
    acc = jnp.zeros((sb, q.shape[1]), jnp.float32)
    for i in range(n_chunks):
        logits = lax.dot_general(
            q, k[i * c:(i + 1) * c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                  # (sb, c), base-2
        m_c = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_c)
        alpha = jnp.exp2(m - m_new)
        e = jnp.exp2(logits - m_new)
        l = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
        acc = acc * alpha + lax.dot_general(
            e.astype(v.dtype), v[i * c:(i + 1) * c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "n_chunks", "interpret"))
def _fullkv_call(q, k, v, block_q: int, n_chunks: int = 1, interpret: bool = False):
    b, h, s, d = q.shape
    sk = k.shape[2]
    if n_chunks > 1:
        kern = functools.partial(_kernel_chunked, n_chunks=n_chunks)
        # TWO per-chunk fp32 logits+exp sets live at once (the unrolled loop
        # pipelines chunk i+1's QK^T against chunk i's VPU drain — measured
        # 34.4 MB at bq=768 nc=8 vs the 25.4 MB single-set estimate)
        # + running m/l/acc + resident K/V
        vmem = int(4 * block_q * (sk // n_chunks) * 4 + 4 * sk * d + (16 << 20))
    else:
        kern = _kernel
        # logits + exp tiles (2 fp32 temporaries) + resident K/V + margin;
        # v5e has 128 MiB VMEM so large q-blocks are legal — the default
        # Mosaic cap would reject block_q >= 256 at S=9216
        vmem = int(2 * block_q * sk * 4 + 4 * sk * d + (8 << 20))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, si: (bi, hi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, si: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, si: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, si: (bi, hi, si, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(q, k, v)
    return out


def _pick_layout(s: int, sk: int) -> tuple:
    """(block_q, n_chunks) measured-best per shape on v5e
    (scripts/profile_fullkv_v2.py, r5):

      ds1 S=9216: (512, 4) 68.4 ms vs (384, 1) 79.5 — chunking lets Mosaic
        interleave chunk i+1's QK^T (MXU) with chunk i's exp2/rowsum (VPU);
        bq in {384..768} x nc in {4, 8} all land within 2% (plateau).
      ds2 S=2304: (2304, 2) 14.4 ms vs (384, 1) 16.1 — whole q in one block,
        two KV chunks.
      ds4 S=576: single-pass 6.9 ms; chunking only adds overhead (12 TF/s —
        tile too small to hide the VPU behind the MXU).

    Unmeasured shapes fall back to single-pass with the conservative block."""
    if sk >= 4096:
        bq = 512 if s % 512 == 0 else _pick_block_q(s, sk)
        return bq, 4
    if 1024 <= sk < 4096:
        if s == sk:  # self-attention: whole q resident, 2 chunks
            return s, 2
        return _pick_block_q(s, sk), 2
    return _pick_block_q(s, sk), 1


def _pick_block_q(s: int, sk: int) -> int:
    """Largest q block whose two fp32 (block_q, S) temporaries (logits, exp)
    fit in VMEM alongside the resident K/V. v5e VMEM is 128 MiB so much
    larger blocks are legal (pass block_q explicitly to use them); the
    6 MiB auto budget is the measured-optimal default at the flagship
    shapes (scripts/profile_fullkv.py)."""
    budget = 6 * 1024 * 1024
    if s == 9216 and sk == 9216:
        # flagship ds1 self-attention: measured-best on v5e
        # (scripts/profile_fullkv.py — 79.4 ms at 384 vs 81.9 at 128 vs 83.1
        # flash); the 14.2 MB logits tile is legal because v5e VMEM is
        # 128 MiB. Gated on sk too: at other KV lengths the 384 block is
        # unmeasured, so fall through to the conservative budget below.
        return 384
    cands = (1024, 768, 512, 384, 256, 192, 128)
    if s <= 1024 and s % 16 == 0:
        cands = (s,) + cands  # tiny maps (ds4: 576) in one block
    for cand in cands:
        if s % cand == 0 and cand * sk * 4 <= budget:
            return cand
    return 0


def fullkv_attention(q, k, v, block_q: int | None = None,
                     n_chunks: int | None = None, interpret: bool = False):
    """q/k/v: (B, S, H, D) — same layout as ops.attention.attention.

    Plain (non-causal, unmasked) softmax attention with the whole K/V
    resident in VMEM. Caller must check supports_fullkv() first.

    n_chunks > 1 switches to the online-softmax chunked kernel (exact same
    math; MXU/VPU interleaving — see _kernel_chunked). Default: measured-best
    per shape (_pick_layout).
    """
    b, s, h, d = q.shape
    sk = k.shape[1]
    import math

    # fold BOTH the attention scale and log2(e) into q (one fp32 multiply on
    # the small q tensor) so the kernel's softmax runs in base 2 — see _kernel
    scale = d ** -0.5 * math.log2(math.e)
    qt = jnp.swapaxes(q, 1, 2)
    qt = (qt.astype(jnp.float32) * scale).astype(qt.dtype)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if block_q is None and n_chunks is None:
        bq, nc = _pick_layout(s, sk)
    else:
        bq = block_q or _pick_block_q(s, sk)
        nc = n_chunks or 1
    out = _fullkv_call(qt, kt, vt, bq, n_chunks=nc, interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


def supports_fullkv(q_shape, k_shape) -> bool:
    """Static qualification: KV resident in VMEM (S_kv*D bf16 <= ~1.5 MB each),
    lane-friendly D, q-sequence tiles into an MXU-friendly block."""
    _, s, _, d = q_shape
    sk = k_shape[1]
    return (
        d in (64, 128)
        and sk % 64 == 0
        and sk * d * 2 <= (3 << 20) // 2
        and _pick_block_q(s, sk) > 0
    )
