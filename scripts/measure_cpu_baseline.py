#!/usr/bin/env python
"""Measure the reference-equivalent CPU single-sweep inference throughput.

The reference's CPU path (BASELINE.md config 1: ``unet-inference.py``, device
fallback at :446) is: numpy BEV rasterization → torch seresnext101-UNet
forward at 336x336x6 → softmax → threshold/open → cv2.findContours +
minAreaRect. This script reproduces that workload's compute shape with a
torch-CPU SE-ResNeXt101 UNet (same stage widths/cardinality/depths, randomly
initialized — weights don't change FLOPs) + the numpy/cv2 post-processing,
and writes ``CPU_BASELINE.json`` at the repo root.

Run once per host: ``python scripts/measure_cpu_baseline.py``
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def build_torch_unet():
    import torch
    import torch.nn as nn

    class SEBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc1 = nn.Linear(c, max(c // 16, 4))
            self.fc2 = nn.Linear(max(c // 16, 4), c)

        def forward(self, x):
            s = x.mean(dim=(2, 3))
            s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
            return x * s[:, :, None, None]

    class Bottleneck(nn.Module):
        def __init__(self, cin, cout, stride=1, cardinality=32):
            super().__init__()
            inner = cout // 2
            self.conv1 = nn.Conv2d(cin, inner, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(inner)
            self.conv2 = nn.Conv2d(
                inner, inner, 3, stride=stride, padding=1, groups=cardinality, bias=False
            )
            self.bn2 = nn.BatchNorm2d(inner)
            self.conv3 = nn.Conv2d(inner, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.se = SEBlock(cout)
            self.down = (
                nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(cout),
                )
                if (cin != cout or stride != 1)
                else None
            )

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.se(self.bn3(self.conv3(y)))
            return torch.relu(y + idn)

    class SEResNeXt101UNet(nn.Module):
        def __init__(self, in_ch=6, n_classes=10):
            super().__init__()
            import torch.nn.functional as F

            self.stem = nn.Sequential(
                nn.Conv2d(in_ch, 64, 7, stride=2, padding=3, bias=False),
                nn.BatchNorm2d(64),
                nn.ReLU(),
                nn.MaxPool2d(3, 2, 1),
            )
            cfg = [(64, 256, 3, 1), (256, 512, 4, 2), (512, 1024, 23, 2), (1024, 2048, 3, 2)]
            stages = []
            for cin, cout, n, s in cfg:
                blocks = [Bottleneck(cin, cout, s)]
                blocks += [Bottleneck(cout, cout) for _ in range(n - 1)]
                stages.append(nn.Sequential(*blocks))
            self.stages = nn.ModuleList(stages)
            self.reduce = nn.ModuleList(
                [nn.Conv2d(c, 64, 1) for c in (256, 512, 1024)]
            )
            self.center = nn.Conv2d(2048, 256, 3, padding=1)
            self.dec = nn.ModuleList([nn.Conv2d(256 + 64, 64, 3, padding=1)]
                                     + [nn.Conv2d(64 + 64, 64, 3, padding=1) for _ in range(2)])
            self.final = nn.Conv2d(64, n_classes, 1)

        def forward(self, x):
            import torch.nn.functional as F

            x = self.stem(x)
            feats = []
            for st in self.stages:
                x = st(x)
                feats.append(x)
            d = torch.relu(self.center(feats[3]))
            for i, dec in enumerate(self.dec):
                skip = self.reduce[2 - i](feats[2 - i])
                d = F.interpolate(d, size=skip.shape[2:], mode="bilinear")
                d = torch.relu(dec(torch.cat([d, skip], 1)))
            d = F.interpolate(d, scale_factor=4, mode="bilinear")
            return self.final(d)

    return SEResNeXt101UNet()


def numpy_raster(points, shape=(336, 336, 3), voxel=(0.4, 0.4, 1.5), z_off=-2.0):
    h, w, c = shape
    col = np.floor(points[:, 0] / voxel[0] + w / 2).astype(np.int64)
    row = np.floor(points[:, 1] / voxel[1] + h / 2).astype(np.int64)
    ch = np.floor((points[:, 2] - z_off) / voxel[2]).astype(np.int64)
    ok = (col >= 0) & (col < w) & (row >= 0) & (row < h) & (ch >= 0) & (ch < c)
    flat = (row[ok] * w + col[ok]) * c + ch[ok]
    counts = np.bincount(flat, minlength=h * w * c).reshape(h, w, c)
    return np.clip(counts / 16.0, 0, 1).astype(np.float32)


def cv2_post(probs):
    import cv2

    fg = ((1.0 - probs[..., 0]) * 255).astype(np.uint8)
    thresh = (fg > 80).astype(np.uint8) * 255
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    opened = cv2.morphologyEx(thresh, cv2.MORPH_OPEN, kernel)
    contours, _ = cv2.findContours(opened, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return [cv2.boxPoints(cv2.minAreaRect(c)) for c in contours]


def main():
    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = build_torch_unet().eval()

    rng = np.random.RandomState(0)
    n_points = 65536
    iters = 3

    with torch.no_grad():
        # warmup
        x = torch.zeros(1, 6, 336, 336)
        model(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            pts = np.column_stack(
                [
                    rng.uniform(-60, 60, n_points),
                    rng.uniform(-60, 60, n_points),
                    rng.uniform(-2.5, 1.0, n_points),
                ]
            ).astype(np.float32)
            bev = numpy_raster(pts)
            inp = np.concatenate([bev, rng.rand(336, 336, 3).astype(np.float32)], -1)
            logits = model(torch.from_numpy(inp.transpose(2, 0, 1)[None]))
            probs = torch.softmax(logits, 1)[0].numpy().transpose(1, 2, 0)
            cv2_post(probs)
        dt = time.perf_counter() - t0

    result = {
        "sweeps_per_sec": iters / dt,
        "seconds_per_sweep": dt / iters,
        "host_threads": torch.get_num_threads(),
        "workload": "numpy raster + torch seresnext101-UNet 336x336x6 fwd + cv2 contours",
    }
    (REPO / "CPU_BASELINE.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
