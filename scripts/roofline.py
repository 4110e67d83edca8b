"""Single-chip roofline analysis for the flagship exact-sampling headline.

Analytically walks the EXACT viewcrafter_25 structures (models/unet3d.py,
models/vae.py — same loops, same channel bookkeeping) and counts, per op
class, the MXU FLOPs and the minimum HBM bytes (activations in+out once,
weights once; VMEM-resident temporaries like attention logits are free).
Divides by v5e peaks to get per-class time floors, then composes the
DDIM-50 exact headline floor:

    50 steps x UNet eval (batched CFG, B=2) + per-frame VAE decode (25)
    + guidance VAE encode (25)   [CLIP/resampler are <1% and ignored]

This answers VERDICT r3 #3: is exact <=60 s on ONE v5e even feasible?
Writes nothing; prints the table that docs/roofline.md records.

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public TPU v5e specs).
"""

import sys
from collections import defaultdict

PEAK_FLOPS = 197e12  # bf16 dense, one v5e chip
PEAK_BW = 819e9      # HBM GB/s

B = 2          # batched CFG (cond + uncond)
T = 25         # frames
LH, LW = 72, 128
MC = 320
TED = 4 * MC
MULTS = (1, 2, 4, 4)
NRES = 2
ATTN_DS = (1, 2, 4)
CTX_TEXT, CTX_IMG, CTX_DIM = 77, 16, 1024
HEAD_D = 64

flops = defaultdict(float)
bytes_ = defaultdict(float)


def mm(cls, m, k, n, batch=1, w_bytes=None, act_bytes=None):
    """batch matmuls of (m,k)@(k,n): FLOPs + HBM floor (read A, write C, weights)."""
    flops[cls] += 2.0 * batch * m * k * n
    bytes_[cls] += (
        w_bytes if w_bytes is not None else k * n * 2
    ) + (act_bytes if act_bytes is not None else batch * (m * k + m * n) * 2)


def conv2d(cls, hw, cin, cout, bt, k=3):
    mm(cls, hw, k * k * cin, cout, batch=bt,
       w_bytes=k * k * cin * cout * 2,
       act_bytes=bt * hw * (cin + cout) * 2)


def attn_full(cls, s_q, s_kv, c, batch):
    """attention over all heads of width c: batch*(heads) (s_q,d)x(d,s_kv)."""
    heads = c // HEAD_D
    flops[cls] += 2.0 * batch * heads * s_q * s_kv * HEAD_D * 2
    bytes_[cls] += batch * heads * (2 * s_q + 2 * s_kv) * HEAD_D * 2


def norm(cls, elems):
    bytes_[cls] += elems * 2 * 2  # read + write, bf16 (fp32 stats negligible)


def spatial_transformer(c, s, bt, ctx_len_text=CTX_TEXT, ctx_len_img=CTX_IMG):
    norm("groupnorm", bt * s * c)
    mm("proj", s, c, c, batch=bt)                      # proj_in
    # attn1 (self): q,k,v,out projections + attention
    norm("layernorm", bt * s * c)
    for _ in range(4):
        mm("spatial_attn_proj", s, c, c, batch=bt)
    attn_full("spatial_attn", s, s, c, bt)
    # attn2 (cross, dual-stream): q + out on s; k,v on text; k_ip,v_ip on img
    norm("layernorm", bt * s * c)
    mm("cross_attn_proj", s, c, c, batch=bt)           # to_q
    mm("cross_attn_proj", ctx_len_text, CTX_DIM, c, batch=bt)  # to_k
    mm("cross_attn_proj", ctx_len_text, CTX_DIM, c, batch=bt)  # to_v
    mm("cross_attn_proj", ctx_len_img, CTX_DIM, c, batch=bt)   # to_k_ip
    mm("cross_attn_proj", ctx_len_img, CTX_DIM, c, batch=bt)   # to_v_ip
    mm("cross_attn_proj", s, c, c, batch=bt)           # to_out
    attn_full("cross_attn", s, ctx_len_text + ctx_len_img, c, bt)
    # FF GEGLU: c -> 2*(4c), then 4c -> c
    norm("layernorm", bt * s * c)
    mm("ff", s, c, 8 * c, batch=bt)
    mm("ff", s, 4 * c, c, batch=bt)
    mm("proj", s, c, c, batch=bt)                      # proj_out


def temporal_transformer(c, s, b, heads=None):
    inner = (heads * HEAD_D) if heads else c
    norm("groupnorm", b * T * s * c)
    mm("proj", T * s, c, inner, batch=b)
    for _ in range(2):  # attn1 + attn2, both self
        norm("layernorm", b * T * s * inner)
        for _ in range(4):
            mm("temporal_attn_proj", T * s, inner, inner, batch=b)
        attn_full("temporal_attn", T, T, inner, b * s)
    norm("layernorm", b * T * s * inner)
    mm("ff", T * s, inner, 8 * inner, batch=b)
    mm("ff", T * s, 4 * inner, inner, batch=b)
    mm("proj", T * s, inner, c, batch=b)


def temporal_conv_block(c, s, b):
    for _ in range(4):
        norm("groupnorm", b * T * s * c)
        # 3-tap temporal conv as 3 matmuls (ops/pallas/temporal_conv.py)
        mm("temporal_conv", T * s, 3 * c, c, batch=b,
           w_bytes=3 * c * c * 2, act_bytes=b * T * s * (c + c) * 2)


def resblock(cin, cout, hw, bt, b):
    norm("groupnorm", bt * hw * cin)
    conv2d("spatial_conv", hw, cin, cout, bt)
    mm("proj", 1, TED, cout, batch=bt)  # emb_proj
    norm("groupnorm", bt * hw * cout)
    conv2d("spatial_conv", hw, cout, cout, bt)
    if cin != cout:
        conv2d("spatial_conv", hw, cin, cout, bt, k=1)
    temporal_conv_block(cout, hw, b)


def unet_eval():
    """One flagship UNet eval at batched CFG B=2 — mirrors UNet3D.__call__."""
    global flops, bytes_
    flops = defaultdict(float)
    bytes_ = defaultdict(float)
    bt = B * T
    hw = {1: LH * LW, 2: (LH // 2) * (LW // 2), 4: (LH // 4) * (LW // 4),
          8: (LH // 8) * (LW // 8)}

    conv2d("spatial_conv", hw[1], 8, MC, bt)                 # in_conv
    temporal_transformer(MC, hw[1], B, heads=8)              # init_attn
    hs = [MC]
    ch, ds = MC, 1
    for level, mult in enumerate(MULTS):
        for _ in range(NRES):
            resblock(ch, mult * MC, hw[ds], bt, B)
            ch = mult * MC
            if ds in ATTN_DS:
                spatial_transformer(ch, hw[ds], bt)
                temporal_transformer(ch, hw[ds], B)
            hs.append(ch)
        if level != len(MULTS) - 1:
            conv2d("spatial_conv", hw[ds * 2], ch, ch, bt)   # downsample
            hs.append(ch)
            ds *= 2
    resblock(ch, ch, hw[ds], bt, B)                          # mid
    spatial_transformer(ch, hw[ds], bt)
    temporal_transformer(ch, hw[ds], B)
    resblock(ch, ch, hw[ds], bt, B)
    for level, mult in list(enumerate(MULTS))[::-1]:
        for j in range(NRES + 1):
            skip = hs.pop()
            resblock(ch + skip, mult * MC, hw[ds], bt, B)
            ch = mult * MC
            if ds in ATTN_DS:
                spatial_transformer(ch, hw[ds], bt)
                temporal_transformer(ch, hw[ds], B)
            if level and j == NRES:
                ds //= 2
                conv2d("spatial_conv", hw[ds], ch, ch, bt)   # upsample conv
                bytes_["spatial_conv"] += bt * hw[ds] * ch * 2  # 2x2 repeat
    norm("groupnorm", bt * hw[1] * ch)
    conv2d("spatial_conv", hw[1], ch, 4, bt)                 # out_conv
    return dict(flops), dict(bytes_)


def vae(direction):
    """Per-frame KL-f8 decoder/encoder FLOPs+bytes (models/vae.py), batch=1."""
    global flops, bytes_
    flops = defaultdict(float)
    bytes_ = defaultdict(float)
    ch, mults, nres = 128, (1, 2, 4, 4), 2
    H, W = 576, 1024

    def res(cin, cout, hw):
        norm("vae_norm", hw * cin)
        conv2d("vae_conv", hw, cin, cout, 1)
        norm("vae_norm", hw * cout)
        conv2d("vae_conv", hw, cout, cout, 1)
        if cin != cout:
            conv2d("vae_conv", hw, cin, cout, 1, k=1)

    if direction == "decoder":
        hw = (H // 8) * (W // 8)
        block_in = ch * mults[-1]
        conv2d("vae_conv", hw, 4, block_in, 1)               # conv_in
        res(block_in, block_in, hw)                          # mid 1
        attn_full("vae_attn", hw, hw, 512, 1)                # mid attn (1 head, d=512)
        flops["vae_attn"] += 0
        for _ in range(4):                                   # q,k,v,out 1x1
            conv2d("vae_conv", hw, 512, 512, 1, k=1)
        res(block_in, block_in, hw)                          # mid 2
        cur = block_in
        for i in reversed(range(len(mults))):
            cout = ch * mults[i]
            for _ in range(nres + 1):
                res(cur, cout, hw)
                cur = cout
            if i != 0:
                hw *= 4
                conv2d("vae_conv", hw, cur, cur, 1)          # upsample conv
        norm("vae_norm", hw * cur)
        conv2d("vae_conv", hw, cur, 3, 1)                    # conv_out
    else:
        hw = H * W
        conv2d("vae_conv", hw, 3, ch, 1)
        cur = ch
        for i, mult in enumerate(mults):
            cout = ch * mult
            for _ in range(nres):
                res(cur, cout, hw)
                cur = cout
            if i != len(mults) - 1:
                hw //= 4
                conv2d("vae_conv", hw, cur, cur, 1)          # strided downsample
        res(cur, cur, hw)
        attn_full("vae_attn", hw, hw, 512, 1)
        for _ in range(4):
            conv2d("vae_conv", hw, 512, 512, 1, k=1)
        res(cur, cur, hw)
        norm("vae_norm", hw * cur)
        conv2d("vae_conv", hw, cur, 2 * 4, 1)                # moments
    return dict(flops), dict(bytes_)


def report(title, f, by):
    print(f"\n== {title} ==")
    print(f"{'op class':24s} {'TFLOP':>8s} {'GB':>8s} {'t_flop ms':>10s} {'t_bw ms':>9s} {'floor ms':>9s} {'bound':>6s}")
    tot_floor = 0.0
    for cls in sorted(set(f) | set(by), key=lambda c: -max(
            f.get(c, 0) / PEAK_FLOPS, by.get(c, 0) / PEAK_BW)):
        tf = f.get(cls, 0) / PEAK_FLOPS * 1e3
        tb = by.get(cls, 0) / PEAK_BW * 1e3
        floor = max(tf, tb)
        tot_floor += floor
        print(f"{cls:24s} {f.get(cls, 0) / 1e12:8.2f} {by.get(cls, 0) / 1e9:8.2f}"
              f" {tf:10.2f} {tb:9.2f} {floor:9.2f} {'FLOP' if tf >= tb else 'BW':>6s}")
    print(f"{'TOTAL (sum of floors)':24s} {sum(f.values()) / 1e12:8.2f} {sum(by.values()) / 1e9:8.2f}"
          f" {sum(f.values()) / PEAK_FLOPS * 1e3:10.2f} {sum(by.values()) / PEAK_BW * 1e3:9.2f} {tot_floor:9.2f}")
    return tot_floor


def main():
    uf, ub = unet_eval()
    unet_floor = report("UNet eval, flagship 25x72x128, batched CFG B=2", uf, ub)
    df, db = vae("decoder")
    dec_floor = report("VAE decode, ONE 576x1024 frame", df, db)
    ef, eb = vae("encoder")
    enc_floor = report("VAE encode, ONE 576x1024 frame", ef, eb)

    steps = 50
    total = steps * unet_floor + T * (dec_floor + enc_floor)
    print(f"\n== DDIM-{steps} exact headline floor (one v5e chip) ==")
    print(f"UNet: {steps} x {unet_floor:.0f} ms            = {steps * unet_floor / 1e3:6.2f} s")
    print(f"VAE decode: {T} x {dec_floor:.0f} ms           = {T * dec_floor / 1e3:6.2f} s")
    print(f"VAE encode (guidance): {T} x {enc_floor:.0f} ms = {T * enc_floor / 1e3:6.2f} s")
    print(f"TOTAL floor                        = {total / 1e3:6.2f} s")
    print(f"(A100-40G reference: 120 s; north star: 60 s)")


if __name__ == "__main__":
    sys.exit(main())
