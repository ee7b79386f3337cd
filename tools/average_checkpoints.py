#!/usr/bin/env python
"""Average the model parameters of the N best checkpoints.

Checkpoint averaging typically buys a few relative percent of WER on
transducer models; operates on the keep-N-best checkpoints written by the
Checkpointer (the reference exposes the same capability through
``speechbrain.utils.checkpoints.average_checkpoints``).

Usage:
    python tools/average_checkpoints.py <save_folder> \
        --num 5 --min_key WER --out averaged.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("save_folder",
                        help="checkpoints dir (experiment save/)")
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--min_key", default="WER")
    parser.add_argument("--recoverable", default="brain",
                        help="which recoverable file to average")
    parser.add_argument("--out", default="averaged.ckpt")
    args = parser.parse_args()

    import numpy as np
    from flax import serialization

    from tsasr_tpu.training.checkpoints import Checkpointer

    ckpt = Checkpointer(args.save_folder)
    best = ckpt.find_checkpoints(min_key=args.min_key,
                                 max_num_checkpoints=args.num)
    if not best:
        raise SystemExit(f"No checkpoints found in {args.save_folder}")
    print(f"Averaging {len(best)} checkpoints "
          f"({[c.meta.get(args.min_key) for c in best]})")

    loaded = []
    for c in best:
        with open(c.paramfile(args.recoverable), "rb") as f:
            loaded.append(serialization.msgpack_restore(f.read()))
    # average only the params subtree; keep everything else (opt state,
    # counters) from the best checkpoint
    out = loaded[0]
    params = [entry["params"] if "params" in entry else entry
              for entry in loaded]
    import jax
    avg = jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0),
                       *params)
    if "params" in out:
        out["params"] = avg
    else:
        out = avg
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
