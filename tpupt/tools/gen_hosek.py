"""Extract the published Hosek-Wilkie RGB sky-model dataset.

The Hosek & Wilkie 2012 "An Analytic Model for Full Spectral Sky-Dome
Radiance" coefficient data (released by the authors under BSD-3 with the
ArHosekSkyModel reference implementation) parameterizes each RGB channel
by 2 albedos x 10 turbidities x 6 solar-elevation bezier control points x
9 distribution coefficients, plus a matching radiance table. This script
reads the dataset from the reference snapshot's vendored copy
(src/ext/ArHosekSkyModelData_RGB.h) into tpupt/tools/hosek_data.npz;
imgtool's makesky evaluates the model from that table (the model MATH is
re-implemented in imgtool.py — only the published constants are carried).

Run:  python -m tpupt.tools.gen_hosek [data_rgb_header] [out.npz]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np


def _parse(text: str, name: str) -> np.ndarray:
    i = text.index(f"double {name}[]")
    j = text.index("{", i)
    k = text.index("}", j)
    body = re.sub(r"//[^\n]*", "", text[j + 1: k])  # strip comments
    vals = re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", body)
    return np.array([float(v) for v in vals])


def main(src="/root/reference/src/ext/ArHosekSkyModelData_RGB.h", out=None):
    out = out or os.path.join(os.path.dirname(__file__), "hosek_data.npz")
    text = open(src).read()
    cfg = np.stack([
        _parse(text, f"datasetRGB{c}").reshape(2, 10, 6, 9)
        for c in (1, 2, 3)
    ])  # (3, albedo, turbidity, ctrl, coeff)
    rad = np.stack([
        _parse(text, f"datasetRGBRad{c}").reshape(2, 10, 6)
        for c in (1, 2, 3)
    ])
    np.savez_compressed(out, config=cfg.astype(np.float64),
                        radiance=rad.astype(np.float64))
    print(f"wrote {out}: config {cfg.shape}, radiance {rad.shape}")


if __name__ == "__main__":
    main(*sys.argv[1:])
