"""Speed-of-light accounting for the fused planner on one TPU chip.

Decomposes the Temporal UNet into its conv-as-matmul constituents and
computes, per layer:

  * useful FLOPs (exact valid-tap count, utils/flops.py conventions);
  * MXU tile-quantized FLOPs: each k-tap conv at (B, L, Cin->Cout) runs as
    k MXU passes of a (B*L, Cin) x (Cin, Cout) contraction, padded to the
    8x128x128 sublane/lane/lane granularity the systolic array consumes;
  * HBM bytes: weights are re-read every sampler step (the scan cannot keep
    30M params resident in 128MB VMEM alongside activations), activations
    read+written once per layer.

From these: the compute ceiling (peak x quantization efficiency), the
bandwidth ceiling (bytes / 819 GB/s on v5e), and where the measured
throughput sits against min(ceilings).  Writes docs/roofline.md.

Host-only (pure arithmetic, no jax).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from edmp_tpu.utils.flops import _down_lengths, _taps  # noqa: E402

PEAK_TFLOPS = 197.0        # v5e bf16
HBM_GBPS = 819.0           # v5e
DIMS = (32, 64, 128, 256, 512, 512)
INPUT_DIM = 7
TRAJ_LEN = 50
T_STEPS = 255
GUIDED_STEPS = 125


def _ceil(a, b):
    return -(-a // b) * b


def matmul_padded_flops(M, K, N):
    """FLOPs the MXU actually spends on an MxKxN contraction after padding
    to (8, 128, 128) granularity."""
    return 2 * _ceil(M, 8) * _ceil(K, 128) * _ceil(N, 128)


def conv_layers(batch):
    """Yield (name, M, K, N, taps, L) for every conv in one UNet forward."""
    all_dims = (INPUT_DIM,) + DIMS
    n = len(DIMS)
    L = _down_lengths(TRAJ_LEN, n)

    def rcb(tag, length, cin, cout):
        yield (f"{tag}.b1", batch * length, cin, cout, 5, length)
        yield (f"{tag}.b2", batch * length, cout, cout, 5, length)
        if cin != cout:
            yield (f"{tag}.res", batch * length, cin, cout, 1, length)

    for i in range(n):
        cin, cout = all_dims[i], all_dims[i + 1]
        yield from rcb(f"down{i}.rcb1", L[i], cin, cout)
        yield from rcb(f"down{i}.rcb2", L[i], cout, cout)
        if i < n - 1:
            yield (f"down{i}.ds", batch * L[i + 1], cout, cout, 3, L[i])
    c = DIMS[-1]
    yield from rcb("mid.rcb1", L[-1], c, c)
    yield from rcb("mid.rcb2", L[-1], c, c)
    for i in range(n, 1, -1):
        cin, cout = all_dims[i], all_dims[i - 1]
        length = L[i - 1]
        yield from rcb(f"up{n-i}.rcb1", length, 2 * cin, cout)
        yield from rcb(f"up{n-i}.rcb2", length, cout, cout)
        yield (f"up{n-i}.tc", batch * length, cout, cout, 4, length)
    yield ("final.blk", batch * TRAJ_LEN, DIMS[0], DIMS[0], 5, TRAJ_LEN)
    yield ("final.out", batch * TRAJ_LEN, DIMS[0], INPUT_DIM, 1, TRAJ_LEN)


def analyze(batch):
    useful = padded = w_bytes = a_bytes = 0
    rows = []
    for name, M, K, N, k, length in conv_layers(batch):
        u = 2 * (M // length) * _taps(length, k) * K * N // 1  # valid taps
        # per-tap matmul padding; the k taps share the (M,K) operand
        p = k * matmul_padded_flops(M, K, N)
        useful += u
        padded += p
        w_bytes += 4 * k * K * N
        a_bytes += 4 * M * (K + N)
        rows.append((name, M, K, N, u, p))
    return useful, padded, w_bytes, a_bytes, rows


def main():
    batch = 840  # S=7 scenes x 120 samples (headline config)
    useful, padded, w_bytes, a_bytes, rows = analyze(batch)
    quant_eff = useful / padded

    # per plan (one scene, batch 120): 255 UNet steps
    per_fwd_useful = useful / 7          # batch 840 = 7 scenes
    compute_ceiling_tps = PEAK_TFLOPS * quant_eff
    # bandwidth: weights re-read per step + activations per step (whole batch)
    step_bytes = w_bytes + a_bytes
    bw_time_per_fwd = step_bytes / (HBM_GBPS * 1e9)
    compute_time_per_fwd = (useful / 1e12) / compute_ceiling_tps
    bound = "bandwidth" if bw_time_per_fwd > compute_time_per_fwd \
        else "compute"

    # scenes/s ceilings (sampler only; guidance ~4% of FLOPs, ~16% of time)
    per_scene_time_c = 255 * compute_time_per_fwd / 7
    per_scene_time_b = 255 * bw_time_per_fwd / 7
    ceiling_scenes = 1.0 / max(per_scene_time_c, per_scene_time_b)

    try:
        with open(os.path.join(os.path.dirname(__file__), os.pardir,
                               "bench_details.json")) as f:
            measured = json.load(f)["configs"][0]["scenes_per_sec"]
    except Exception:
        measured = None

    worst = sorted(rows, key=lambda r: r[4] / r[5])[:6]
    lines = [
        "# Roofline: where the fused planner sits on one v5e chip",
        "",
        f"UNet conv pyramid at batch {batch} (S=7 folded scenes x 120 "
        "samples):",
        "",
        f"- useful FLOPs / forward: **{useful/1e9:.1f} GFLOP**",
        f"- MXU tile-quantized FLOPs / forward: {padded/1e9:.1f} GFLOP -> "
        f"**quantization efficiency {100*quant_eff:.1f}%** "
        f"(compute ceiling {compute_ceiling_tps:.0f} TFLOP/s of "
        f"{PEAK_TFLOPS:.0f} peak)",
        f"- HBM traffic / forward: weights {w_bytes/1e6:.0f} MB (re-read "
        f"every step; 30M params cannot stay VMEM-resident) + activations "
        f"{a_bytes/1e6:.0f} MB = {step_bytes/1e6:.0f} MB -> bandwidth time "
        f"{1e6*bw_time_per_fwd:.0f} us vs compute time "
        f"{1e6*compute_time_per_fwd:.0f} us -> the sampler is "
        f"**{bound}-limited**",
        "",
        f"Sampler-only ceiling: **{ceiling_scenes:.1f} scenes/s**"
        + (f"; measured end-to-end (incl. guidance + selection): "
           f"**{measured} scenes/s = {100*measured/ceiling_scenes:.0f}% of "
           "the sampler ceiling**" if measured else ""),
        "",
        "Worst tile-quantization offenders (the UNet's bottom levels cannot "
        "fill 128-wide MXU tiles at L=2-7):",
        "",
        "| layer | M | K | N | useful/padded |",
        "|---|---|---|---|---|",
    ]
    for name, M, K, N, u, p in worst:
        lines.append(f"| {name} | {M} | {K} | {N} | {100*u/p:.0f}% |")
    lines += [
        "",
        "Implications: (1) larger scene folds raise M and help the small-L "
        "levels — measured 21.1 -> 21.9 scenes/s from S=7 -> 17; (2) the "
        "input/output levels (K=7 or 32 vs 128-wide tiles) are inherently "
        "padded; (3) a wider-but-shallower UNet would raise MFU but break "
        "checkpoint parity — out of scope for a parity framework.",
    ]
    out = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                       "roofline.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
