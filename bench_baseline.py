"""Reference-stack baseline measurement.

The reference publishes no benchmark numbers (BASELINE.md): its stack is
PyTorch + timm on CUDA/MPS/CPU. timm is not installed here, so we measure a
faithful hand-built torch ViT-B/16 @224 (same dims: patch16, 768/12/12,
MLP 4x, 4-channel input, 13-dim metadata MLP fusion and the same classifier
head) doing full fwd+bwd train steps on this host's torch backend (CPU) —
the "reference framework on the hardware available here" number that
bench.py's vs_baseline is computed against.

Result is cached in .bench_baseline.json (measuring is slow on 1 CPU core).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

CACHE = Path(__file__).parent / ".bench_baseline.json"


def build_torch_vit_b16(num_classes: int = 8, in_ch: int = 4):
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, d=768, h=12):
            super().__init__()
            self.n1 = nn.LayerNorm(d)
            self.attn = nn.MultiheadAttention(d, h, batch_first=True)
            self.n2 = nn.LayerNorm(d)
            self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                     nn.Linear(4 * d, d))

        def forward(self, x):
            y = self.n1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            x = x + self.mlp(self.n2(x))
            return x

    class TorchViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = nn.Conv2d(in_ch, 768, 16, 16)
            self.cls = nn.Parameter(torch.zeros(1, 1, 768))
            self.pos = nn.Parameter(torch.zeros(1, 197, 768))
            self.blocks = nn.Sequential(*[Block() for _ in range(12)])
            self.norm = nn.LayerNorm(768)
            self.meta = nn.Sequential(
                nn.Linear(13, 256), nn.BatchNorm1d(256), nn.GELU(),
                nn.Dropout(0.4), nn.Linear(256, 128), nn.BatchNorm1d(128),
                nn.GELU())
            self.head = nn.Sequential(nn.Linear(768 + 128, 512), nn.GELU(),
                                      nn.Dropout(0.5), nn.Linear(512, num_classes))

        def forward(self, x, m):
            b = x.shape[0]
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(b, -1, -1), x], 1) + self.pos
            x = self.norm(self.blocks(x))[:, 0]
            return self.head(torch.cat([x, self.meta(m)], 1))

    return TorchViT()


def measure_torch_baseline(batch_size: int = 4, steps: int = 3) -> float:
    """Images/sec of the torch reference-equivalent train step on this host."""
    import torch
    torch.manual_seed(0)
    model = build_torch_vit_b16()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-5)
    x = torch.randn(batch_size, 4, 224, 224)
    m = torch.randn(batch_size, 13)
    y = torch.randint(0, 8, (batch_size,))
    crit = torch.nn.CrossEntropyLoss()

    def step():
        opt.zero_grad(set_to_none=True)
        loss = crit(model(x, m), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def get_baseline() -> dict:
    if CACHE.exists():
        return json.loads(CACHE.read_text())
    ips = measure_torch_baseline()
    result = {
        "metric": "vit_b16_224_train_images_per_sec",
        "value": ips,
        "unit": "images/sec",
        "stack": "torch-cpu reference-equivalent (timm unavailable; see module docstring)",
        "batch_size": 4,
    }
    CACHE.write_text(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    print(json.dumps(get_baseline()))
