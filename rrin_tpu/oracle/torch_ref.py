"""Minimal PyTorch RRIN oracle (SURVEY.md §7.1 `oracle/torch_ref.py`).

Implements the cascade exactly per SURVEY.md App-A/App-B with the reference
module layout (``flow/refine/mask/final``, each with ``conv1, conv2,
down1..4, up1..4, conv3``) so state dicts round-trip through
rrin_tpu.params. CPU-only; used by parity tests and as the measured
throughput baseline (BASELINE.md).

NOTE: written from the survey spec, not copied from the (empty) reference
mount — SURVEY.md §0.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Down(nn.Module):
    def __init__(self, cin: int, cout: int, k: int):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, k, stride=1, padding=(k - 1) // 2)
        self.conv2 = nn.Conv2d(cout, cout, k, stride=1, padding=(k - 1) // 2)

    def forward(self, x):
        x = F.avg_pool2d(x, 2)
        x = F.leaky_relu(self.conv1(x), negative_slope=0.1)
        x = F.leaky_relu(self.conv2(x), negative_slope=0.1)
        return x


class Up(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=1, padding=1)
        self.conv2 = nn.Conv2d(2 * cout, cout, 3, stride=1, padding=1)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        x = F.leaky_relu(self.conv1(x), negative_slope=0.1)
        x = F.leaky_relu(self.conv2(torch.cat((x, skip), dim=1)), negative_slope=0.1)
        return x


class UNet(nn.Module):
    """SURVEY.md App-B: 7x7 stem, 4 avg-pool downs (5,3,3,3), 4 bilinear ups,
    3x3 head with no activation."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, 32, 7, stride=1, padding=3)
        self.conv2 = nn.Conv2d(32, 32, 7, stride=1, padding=3)
        self.down1 = Down(32, 64, 5)
        self.down2 = Down(64, 128, 3)
        self.down3 = Down(128, 256, 3)
        self.down4 = Down(256, 512, 3)
        self.up1 = Up(512, 256)
        self.up2 = Up(256, 128)
        self.up3 = Up(128, 64)
        self.up4 = Up(64, 32)
        self.conv3 = nn.Conv2d(32, cout, 3, stride=1, padding=1)

    def forward(self, x):
        x = F.leaky_relu(self.conv1(x), negative_slope=0.1)
        s1 = F.leaky_relu(self.conv2(x), negative_slope=0.1)
        s2 = self.down1(s1)
        s3 = self.down2(s2)
        s4 = self.down3(s3)
        x = self.down4(s4)
        x = self.up1(x, s4)
        x = self.up2(x, s3)
        x = self.up3(x, s2)
        x = self.up4(x, s1)
        return self.conv3(x)


def warp(img: torch.Tensor, flow: torch.Tensor, align_corners: bool = False) -> torch.Tensor:
    """Reference-style backward warp: meshgrid + flow -> [-1,1] -> grid_sample
    (SURVEY.md §2.1 row 4; normalization 2p/(S-1)-1)."""
    b, _, h, w = flow.shape
    xx = torch.arange(w, dtype=flow.dtype).view(1, 1, 1, w).expand(b, 1, h, w)
    yy = torch.arange(h, dtype=flow.dtype).view(1, 1, h, 1).expand(b, 1, h, w)
    vgrid = torch.cat((xx, yy), dim=1) + flow
    vx = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    grid = torch.stack((vx, vy), dim=-1)
    return F.grid_sample(
        img, grid, mode="bilinear", padding_mode="zeros", align_corners=align_corners
    )


class Net(nn.Module):
    """The full cascade, NCHW (SURVEY.md §3.1 / App-A)."""

    def __init__(self, align_corners: bool = False):
        super().__init__()
        self.flow = UNet(6, 4)
        self.refine = UNet(10, 4)
        self.mask = UNet(16, 2)
        self.final = UNet(9, 3)
        self.align_corners = align_corners

    def forward(self, i0: torch.Tensor, i1: torch.Tensor, t: float = 0.5) -> torch.Tensor:
        flows = self.flow(torch.cat((i0, i1), dim=1))
        f01, f10 = flows[:, :2], flows[:, 2:]
        ft0 = -(1.0 - t) * t * f01 + t * t * f10
        ft1 = (1.0 - t) * (1.0 - t) * f01 - t * (1.0 - t) * f10
        res = self.refine(torch.cat((ft0, ft1, i0, i1), dim=1))
        ft0 = ft0 + res[:, :2]
        ft1 = ft1 + res[:, 2:]
        g0 = warp(i0, ft0, self.align_corners)
        g1 = warp(i1, ft1, self.align_corners)
        m = torch.sigmoid(self.mask(torch.cat((ft0, ft1, i0, i1, g0, g1), dim=1)))
        w0 = (1.0 - t) * m[:, 0:1]
        w1 = t * m[:, 1:2]
        coarse = (w0 * g0 + w1 * g1) / (w0 + w1 + 1e-8)
        out = coarse + self.final(torch.cat((i0, i1, coarse), dim=1))
        return torch.clamp(out, 0.0, 1.0)
