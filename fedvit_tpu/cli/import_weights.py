"""Pretrained-weight import CLI — torch/timm weights file → orbax checkpoint.

    python -m fedvit_tpu.cli.import_weights \
        --weights swinv2_large_384.safetensors --config config.yaml \
        --output ./pretrained/swinv2_large_384

This closes the reference's production path on TPU. The reference sets
`pretrained: true` (/root/reference/config.yaml:31): timm downloads the
backbone checkpoint and `_modify_input_channels` performs 4-channel surgery
on the pretrained patch-embed (/root/reference/model.py:112-124,150-166).
This host has no network egress, so the download step moves to any networked
machine; everything after it happens here:

  1. on a networked host:  save the timm checkpoint file, e.g.
       python -c "import timm, torch; m = timm.create_model(
           'swinv2_large_window12to24_192to384.ms_in22k_ft_in1k',
           pretrained=True, num_classes=0);
           torch.save(m.state_dict(), 'swinv2_large_384.pt')"
  2. here:  this CLI converts the file — backbone key remap
     (models/import_weights.py), 4-channel patch-embed expansion when the
     config feeds masks, ViT pos-embed resampling when image sizes differ —
     and writes an orbax checkpoint with fresh head/metadata init.
  3. set `model.pretrained_path: <output>` in the YAML (with
     `pretrained: true` kept for reference-config compatibility):
     `cli.train` starts every fold from it.

Accepts bare timm BACKBONE state dicts and full reference ISICClassifier
state dicts (keys `backbone.* / classifier.* / metadata_branch.*`); the
latter also imports the head, giving fp32 logits parity with the torch
model (tested in tests/test_import_cli.py).

Supported file types: torch `.pt`/`.pth`/`.bin` (needs torch on this host —
it is baked in), `.safetensors`, `.npz`.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert torch/timm pretrained weights to a fedvit_tpu "
                    "starting checkpoint")
    parser.add_argument("--weights", type=str, required=True,
                        help="torch .pt/.pth/.bin, .safetensors, or .npz "
                             "state-dict file")
    parser.add_argument("--config", type=str, default="config.yaml",
                        help="Training config the checkpoint will be used "
                             "with (fixes backbone/image_size/in_channels)")
    parser.add_argument("--output", type=str, required=True, metavar="DIR",
                        help="Output checkpoint directory (becomes "
                             "model.pretrained_path)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fedvit_tpu.core.config import load_config
    from fedvit_tpu.models import build_model
    from fedvit_tpu.models.import_weights import (import_pretrained_file,
                                                  load_torch_file)
    from fedvit_tpu.train.checkpoint import save_pretrained

    cfg = load_config(args.config)
    sd = load_torch_file(args.weights)
    kind = ("full ISICClassifier"
            if any(k.startswith("backbone.") for k in sd) else "backbone")
    print(f"[import] {args.weights}: {len(sd)} tensors ({kind} state dict)",
          file=sys.stderr)

    model = build_model(cfg)
    rng = jax.random.key(cfg.seed)
    x = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size,
                   cfg.in_channels), jnp.float32)
    meta = jnp.zeros((1, cfg.model.metadata.input_dim), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, meta)

    variables = import_pretrained_file(sd, cfg, dict(variables))
    save_pretrained(args.output, variables, cfg, source=str(args.weights))
    print(f"[import] wrote {args.output} — set model.pretrained_path to it "
          f"(and keep pretrained: true) to train from these weights",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
