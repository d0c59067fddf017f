"""Analytic FLOP model of one guided plan (auditable MFU accounting).

Counts multiply-adds as 2 FLOPs.  The dominant term is the Temporal UNet's
conv pyramid (dims (32,64,128,256,512,512) over horizon 50->25->13->7->4->2,
diffusion/models/temporalunet.py / blocks.py); the guidance term (FK chain +
AABB overlap + hand-derived adjoint, costs/grad_kernel.py) is counted at the
~1% level it actually contributes.  Used by bench.py to cross-check XLA's own
cost model and to derive tflops_per_sec / mfu_pct.
"""

from __future__ import annotations


def _down_lengths(traj_len: int, n_levels: int):
    """Horizon pyramid under the stride-2 k3 p1 downsampling convs."""
    lengths = [traj_len]
    for _ in range(n_levels - 1):
        lengths.append((lengths[-1] + 2 - 3) // 2 + 1)
    return lengths


def _taps(length, k, stride=1, pad=None):
    """Exact number of (output, valid-input-tap) pairs of a 1-D conv —
    zero-padded edge taps cost nothing and XLA does not count them (at the
    UNet's L=2 bottom level more than half the nominal taps are padding)."""
    if pad is None:
        pad = k // 2
    n_out = (length + 2 * pad - k) // stride + 1
    total = 0
    for t in range(n_out):
        lo = t * stride - pad
        total += min(length - 1, lo + k - 1) - max(0, lo) + 1
    return total


def _conv(batch, length, k, cin, cout, stride=1, pad=None):
    return 2 * batch * _taps(length, k, stride, pad) * cin * cout


def _conv_transpose(batch, length_in, k, cin, cout):
    """Stride-2 transpose conv: each input contributes k taps (the zero
    inserted positions contribute nothing)."""
    return 2 * batch * length_in * k * cin * cout


def unet_forward_flops(batch: int, traj_len: int = 50,
                       dims=(32, 64, 128, 256, 512, 512),
                       input_dim: int = 7, time_dim: int = 32) -> int:
    """One epsilon prediction at the given batch."""
    all_dims = (input_dim,) + tuple(dims)
    n = len(dims)
    L = _down_lengths(traj_len, n)
    total = 0

    def rcb(length, cin, cout):
        f = _conv(batch, length, 5, cin, cout)      # block1 conv
        f += _conv(batch, length, 5, cout, cout)    # block2 conv
        f += 2 * batch * time_dim * cout            # time MLP dense
        if cin != cout:
            f += _conv(batch, length, 1, cin, cout)  # 1x1 residual
        return f

    for i in range(n):                               # down path
        cin, cout = all_dims[i], all_dims[i + 1]
        total += rcb(L[i], cin, cout) + rcb(L[i], cout, cout)
        if i < n - 1:                                # stride-2 downsample
            total += _conv(batch, L[i], 3, cout, cout, stride=2, pad=1)

    c = all_dims[-1]
    total += 2 * rcb(L[-1], c, c)                    # middle block

    for i in range(n, 1, -1):                        # up path
        cin, cout = all_dims[i], all_dims[i - 1]
        length = L[i - 1]
        total += rcb(length, 2 * cin, cout) + rcb(length, cout, cout)
        total += _conv_transpose(batch, length, 4, cout, cout)

    total += _conv(batch, traj_len, 5, all_dims[1], all_dims[1])  # final blk
    total += _conv(batch, traj_len, 1, all_dims[1], input_dim)
    # time embedding MLP (dim -> 4dim -> dim)
    total += 2 * (time_dim * 4 * time_dim) * 2
    return total


def guidance_flops(batch: int, traj_len: int = 50, n_links: int = 9,
                   n_obstacles: int = 8) -> int:
    """One guidance gradient: FK + link AABBs + overlap volumes + adjoint.

    Per (sample, waypoint): 7 DH composes (3x3 matmul 54 + R@p 18 + trig ~40
    flops each), 9 static-frame composes, 9 |R|h AABB extents (54), then
    per (link, obstacle) overlap volume ~20 flops.  The reverse pass costs
    ~2x the forward (hand-derived adjoints, costs/grad_kernel.py)."""
    per_wp_fk = 7 * (54 + 18 + 40) + n_links * (54 + 18) + n_links * 54
    per_wp_overlap = n_links * n_obstacles * 20
    # swept-volume variant also forms consecutive-pair hulls: ~+30%
    fwd = batch * (traj_len + 2) * (per_wp_fk + int(1.3 * per_wp_overlap))
    return 3 * fwd  # forward + ~2x adjoint


def plan_flops_analytic(batch: int, traj_len: int, n_steps: int,
                        guided_steps: int, n_obstacles: int = 8) -> int:
    """Total FLOPs of one scene's plan (sampler + guidance + selection)."""
    total = n_steps * unet_forward_flops(batch, traj_len)
    total += guided_steps * guidance_flops(batch, traj_len,
                                           n_obstacles=n_obstacles)
    # selection: one swept-volume cost pass
    total += guidance_flops(batch, traj_len, n_obstacles=n_obstacles) // 3
    return int(total)
