"""Mask precompute CLI — parity of /root/reference/precompute_masks.py:168-202.

    python -m fedvit_tpu.cli.precompute_masks --isic_dir ./ISIC \
        --output_dir ./masks [--image_size 224] [--workers 8] [--batch 32]

Same pipeline, different engine: the reference fans single-image OpenCV over
a ProcessPoolExecutor; here host threads decode while the classical-CV
segmentation (ops/cvseg) runs in device batches.
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List

import numpy as np


def collect_image_paths(image_dir: Path) -> List[Path]:
    """(reference precompute_masks.py:116-121)"""
    paths: List[Path] = []
    for ext in ("*.jpg", "*.jpeg", "*.png"):
        paths.extend(image_dir.glob(ext))
    return sorted(paths)


def _decode(path: Path, size: int):
    from PIL import Image
    try:
        with Image.open(path) as im:
            # decode at 2x target then let the device resize do the
            # area-style downscale (parity with cv2.INTER_AREA from full res)
            im = im.convert("RGB").resize((size * 2, size * 2),
                                          Image.BILINEAR)
            return np.asarray(im, np.uint8)
    except Exception:
        return None


def precompute_masks(image_dir: Path, output_dir: Path, target_size: int,
                     workers: int, batch: int, log=print) -> int:
    import jax.numpy as jnp
    from PIL import Image
    from fedvit_tpu.ops.cvseg import segment_lesion_batch

    output_dir.mkdir(parents=True, exist_ok=True)
    paths = collect_image_paths(image_dir)
    if not paths:
        log(f"  No images found in {image_dir}")
        return 0
    log(f"  Found {len(paths)} images")

    count = skipped = 0
    pool = ThreadPoolExecutor(max_workers=max(1, workers))
    for s in range(0, len(paths), batch):
        chunk = paths[s:s + batch]
        decoded = list(pool.map(lambda p: _decode(p, target_size), chunk))
        keep = [(p, d) for p, d in zip(chunk, decoded) if d is not None]
        skipped += len(chunk) - len(keep)
        if not keep:
            continue
        arr = np.stack([d for _, d in keep]).astype(np.float32) / 255.0
        # pad to full batch for a single compiled shape
        n = len(keep)
        if n < batch:
            arr = np.concatenate([arr, np.repeat(arr[-1:], batch - n, 0)])
        masks = np.asarray(segment_lesion_batch(jnp.asarray(arr),
                                                target_size))[:n]
        for (p, _), m in zip(keep, masks):
            out = (m[..., 0] * 255).astype(np.uint8)
            Image.fromarray(out).save(output_dir / f"{p.stem}.png")
            count += 1
    pool.shutdown()
    if skipped:
        log(f"  Skipped {skipped} unreadable images")
    return count


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Precompute lesion masks (classical CV, on-device)")
    parser.add_argument("--isic_dir", type=str, default="./ISIC")
    parser.add_argument("--output_dir", type=str, default="./masks")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--workers", type=int, default=8,
                        help="host decode threads")
    parser.add_argument("--batch", type=int, default=32,
                        help="device batch size")
    args = parser.parse_args(argv)

    from fedvit_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    isic_dir = Path(args.isic_dir)
    output_dir = Path(args.output_dir)
    for split_name, subdir in [("Training", "ISIC_2019_Training_Input"),
                               ("Test", "ISIC_2019_Test_Input")]:
        image_dir = isic_dir / subdir
        if not image_dir.exists():
            print(f"[{split_name}] Skipping – {image_dir} not found")
            continue
        print(f"\n[{split_name}] Processing images from {image_dir}")
        t0 = time.time()
        n = precompute_masks(image_dir, output_dir, args.image_size,
                             args.workers, args.batch)
        print(f"[{split_name}] Saved {n} masks → {output_dir} "
              f"({time.time()-t0:.1f}s)")
    print("\nDone!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
