"""Build (and package-cache) the per-class symmetry tables.

Detection is minutes of compute per model set; the resulting tables are
tiny (C x S x 3 x 3 float32) and ship inside the package
(cloudaae_tpu/_cache/) so fresh environments never pay the cost.

    python scripts/build_symtable.py [--view] [--num-class 21] [--commit]

--view builds the depth-view-extended table (S=32);
--num-class 13 builds the LINEMOD stand-in subset table;
--commit copies the cache file into cloudaae_tpu/_cache/.
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--view", action="store_true")
    p.add_argument("--num-class", type=int, default=21)
    p.add_argument("--commit", action="store_true")
    p.add_argument(
        "--models",
        default="/root/reference/object_model_tfrecord/obj_models.tfrecords",
    )
    args = p.parse_args()

    from cloudaae_tpu import symmetry
    from cloudaae_tpu.data import load_object_models

    obj = load_object_models(args.models)[: args.num_class]
    pts = np.asarray(obj[..., :3], np.float32)
    table = symmetry.build_symmetry_table_cached(
        pts,
        max_syms=32 if args.view else 16,
        view_sym=args.view,
    )
    counts = symmetry.num_symmetries(table)
    print("group sizes:", {c: int(n) for c, n in enumerate(counts)})

    if args.commit:
        # locate the cache file build_symmetry_table_cached just wrote
        name = symmetry.table_cache_name(
            pts, max_syms=32 if args.view else 16, view_sym=args.view
        )
        src = os.path.join(
            os.path.expanduser("~"), ".cache", "cloudaae_tpu", name
        )
        dst = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "cloudaae_tpu", "_cache", name,
        )
        shutil.copyfile(src, dst)
        print(f"committed {dst}")


if __name__ == "__main__":
    main()
