#!/usr/bin/env python
"""NIfTI header/orientation quick-look — reference ``Utils/nifti.py``.

Prints header fields (dims, datatype, scl, affine/sform) and optionally
writes a 4-panel orientation figure like the reference's
(``Utils/nifti.py:88-212``).

    python tools/nifti_info.py vol.nii [--fig out.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from pmpu_tpu.data import nifti  # noqa: E402

_DT_NAMES = {2: "uint8", 4: "int16", 8: "int32", 16: "float32", 64: "float64",
             256: "int8", 512: "uint16", 768: "uint32", 1024: "int64", 1280: "uint64"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--fig", default=None, help="write 4-panel orientation figure")
    a = ap.parse_args()

    hdr = nifti.read_header(a.path)
    print(f"file        : {a.path}")
    print(f"shape       : {hdr.shape}")
    print(f"datatype    : {hdr.datatype} ({_DT_NAMES.get(hdr.datatype, '?')}), bitpix {hdr.bitpix}")
    print(f"pixdim      : {tuple(round(p, 4) for p in hdr.pixdim[1:4])}")
    print(f"vox_offset  : {hdr.vox_offset}")
    print(f"scl slope/in: {hdr.scl_slope} / {hdr.scl_inter}")
    print(f"qform/sform : {hdr.qform_code} / {hdr.sform_code}")
    print("affine      :")
    for row in hdr.affine:
        print("   ", np.array2string(row, precision=3))

    if a.fig:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        vol = nifti.load(a.path)
        fig, axes = plt.subplots(2, 2, figsize=(8, 8))
        c = [s // 2 for s in vol.shape]
        axes[0, 0].imshow(vol[c[0], :, :], cmap="gray")
        axes[0, 0].set_title("axis 0 (mid)")
        axes[0, 1].imshow(vol[:, c[1], :], cmap="gray")
        axes[0, 1].set_title("axis 1 (mid)")
        axes[1, 0].imshow(vol[:, :, c[2]], cmap="gray")
        axes[1, 0].set_title("axis 2 (mid)")
        axes[1, 1].hist(vol.ravel(), bins=64)
        axes[1, 1].set_title("intensity histogram")
        for ax in axes.flat[:3]:
            ax.axis("off")
        fig.suptitle(f"{os.path.basename(a.path)} {hdr.shape}")
        fig.tight_layout()
        fig.savefig(a.fig, dpi=120)
        print(f"wrote {a.fig}")


if __name__ == "__main__":
    main()
