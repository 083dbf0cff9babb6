"""Analytic HBM-traffic model for the MobileNetV2 backbone (PERF.md).

Logical activation bytes per train step at CamVid shapes (bs48, 360x480,
bf16): each conv reads its input and writes its output (BN/relu fused as
epilogues — the ideal); backward ~= dgrad + wgrad + BN-train extra passes
~= 2.7x forward traffic, i.e. fwd+bwd ~= 3.7x fwd. Compare with the
measured `backbone_fwd` / `backbone_train_nodwgrad` probes to get the
fraction-of-roofline numbers quoted in PERF.md.

Usage: python scripts/traffic_model.py
"""

from __future__ import annotations

B, ITEM = 48, 2          # batch, bf16 bytes
HBM_GBPS = 819.0         # v5e HBM roofline

SETTINGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def plan(output_stride: int = 16):
    p = []
    inp, cur, rate = 32, 2, 1
    for t, c, n, s in SETTINGS:
        if cur == output_stride:
            stride, dil = 1, rate
            rate *= s
        else:
            stride, dil = s, 1
            cur *= s
        for i in range(n):
            p.append((inp, c, stride if i == 0 else 1, dil, t))
            inp = c
    return p


def main():
    def gb(els):
        return els * ITEM / 1e9

    h, w = 180, 240  # after the stride-2 stem
    fwd = gb(B * (360 * 480 * 3 + h * w * 32))  # stem read + write
    rows = []
    for inp, oup, st, _dil, t in plan():
        hid = inp * t
        ho, wo = h // st, w // st
        e = 0 if t == 1 else B * (h * w * inp + h * w * hid)
        d = B * (h * w * hid + ho * wo * hid)
        p = B * (ho * wo * hid + ho * wo * oup)
        if st == 1 and inp == oup:
            p += B * ho * wo * inp  # residual read
        rows.append((inp, oup, st, h, w, gb(e + d + p)))
        fwd += gb(e + d + p)
        h, w = ho, wo

    print(f"backbone fwd logical: {fwd:.2f} GB -> "
          f"{fwd / HBM_GBPS * 1000:.1f} ms at {HBM_GBPS:.0f} GB/s")
    print(f"fwd+bwd (~3.7x fwd):  {3.7 * fwd:.2f} GB -> "
          f"{3.7 * fwd / HBM_GBPS * 1000:.1f} ms")
    print("per-block fwd GB (in, out, stride, h, w):")
    for r in rows:
        print(f"  {r[0]:4d} -> {r[1]:4d} s{r[2]} @ {r[3]}x{r[4]}: "
              f"{r[5]:.3f}")


if __name__ == "__main__":
    main()
