"""Generate the repo-owned benchmark/demo image (assets/sample.jpg).

Synthesizes an industrial-inspection-style photo — a brushed-metal plate
with corner bolts, a hairline scratch, and a corrosion patch — entirely
from numpy/PIL so the repository is self-contained (the round-1 bench
reached into the read-only reference mount for its sample input).

Run `python assets/make_sample.py` to regenerate deterministically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw, ImageFilter

W, H = 1024, 768


def main() -> None:
    rng = np.random.default_rng(42)

    # Brushed-metal base: horizontal streak noise over a vignette gradient.
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 150 + 25 * np.cos((yy / H - 0.5) * 2.2) + 10 * (xx / W - 0.5)
    streaks = rng.normal(0, 6.0, (H, 1)).repeat(W, axis=1)
    fine = rng.normal(0, 3.0, (H, W))
    gray = np.clip(base + streaks + fine, 0, 255)
    img_arr = np.stack([gray * 0.98, gray, gray * 1.04], axis=-1)
    img = Image.fromarray(np.clip(img_arr, 0, 255).astype(np.uint8), "RGB")
    img = img.filter(ImageFilter.GaussianBlur(0.6))
    draw = ImageDraw.Draw(img)

    # Plate edge + corner bolts.
    draw.rectangle([28, 28, W - 29, H - 29], outline=(70, 72, 78), width=6)
    for cx, cy in [(78, 78), (W - 78, 78), (78, H - 78), (W - 78, H - 78)]:
        draw.ellipse([cx - 26, cy - 26, cx + 26, cy + 26],
                     fill=(96, 98, 104), outline=(50, 52, 58), width=4)
        draw.ellipse([cx - 10, cy - 10, cx + 10, cy + 10], fill=(60, 62, 66))
        draw.line([cx - 18, cy, cx + 18, cy], fill=(44, 46, 50), width=5)

    # Hairline scratch: jagged dark polyline, upper-middle region.
    x = 320.0
    y = 240.0
    pts = [(x, y)]
    for _ in range(40):
        x += rng.uniform(8, 16)
        y += rng.uniform(-6, 9)
        pts.append((x, y))
    draw.line(pts, fill=(58, 56, 54), width=3)
    draw.line([(p[0], p[1] + 1.5) for p in pts], fill=(210, 210, 214), width=1)

    # Corrosion patch: blotchy rust ellipses, lower-right region.
    cx, cy = 700, 540
    for _ in range(160):
        dx, dy = rng.normal(0, 48), rng.normal(0, 30)
        r = abs(rng.normal(6, 4)) + 2
        shade = rng.uniform(0, 1)
        color = (
            int(120 + 60 * shade), int(60 + 30 * shade), int(25 + 15 * shade)
        )
        draw.ellipse([cx + dx - r, cy + dy - r, cx + dx + r, cy + dy + r],
                     fill=color)
    img = img.filter(ImageFilter.GaussianBlur(0.4))

    out = Path(__file__).parent / "sample.jpg"
    img.save(out, "JPEG", quality=88)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
