"""Build the packed TF-binding score tables from raw Barrera et al. TSVs.

Reads every `*_8mers.txt` measurement file (the reference distribution keeps
them at flexs/landscapes/data/tf_binding/), min-max normalizes E-scores and
densifies into one float32[num_landscapes, 4^8] array saved as
flexs_tpu/landscapes/data/tf_binding.npz.

Usage:
    python scripts/build_tf_binding_data.py [raw_tsv_dir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flexs_tpu.landscapes.tf_binding import _DATA_DIR, table_from_tsv  # noqa: E402


def main():
    raw_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/flexs/landscapes/data/tf_binding"
    )
    fnames = sorted(f for f in os.listdir(raw_dir) if f.endswith("_8mers.txt"))
    names, tables = [], []
    for i, fname in enumerate(fnames):
        names.append(fname.replace("_8mers.txt", ""))
        tables.append(table_from_tsv(os.path.join(raw_dir, fname)))
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(fnames)}")

    os.makedirs(_DATA_DIR, exist_ok=True)
    out = os.path.join(_DATA_DIR, "tf_binding.npz")
    np.savez_compressed(
        out, names=np.array(names), tables=np.stack(tables).astype(np.float32)
    )
    print(f"wrote {out}: {len(names)} landscapes")


if __name__ == "__main__":
    main()
