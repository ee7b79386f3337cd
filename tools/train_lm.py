#!/usr/bin/env python
"""Train an RNN-LM on LibriSpeechMix transcripts for shallow fusion.

Usage:
    python tools/train_lm.py --data_folder /path --tokenizer tok.json \
        --out lm.msgpack [--epochs 5] [--batch_size 32] ...

Produces a flax msgpack checkpoint consumable by the recipe's
``lm_path`` hparam (decode-time shallow fusion; reference hook:
``decoders/transducer.py:311-314``). Trains on the texts of the train
manifest with teacher forcing: inputs = [blank] + tokens[:-1],
targets = tokens; next-token cross-entropy.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--split", default="train-2mix")
    ap.add_argument("--tokenizer", required=True,
                    help="saved tokenizer json (char/bpe/unigram)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_len", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--embedding_dim", type=int, default=128)
    ap.add_argument("--hidden_size", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=2)
    args = ap.parse_args()

    import numpy as np

    import flax.serialization
    import jax
    import jax.numpy as jnp
    import optax

    from tsasr_tpu.data.tokenizer import load_tokenizer
    from tsasr_tpu.models.lm import RNNLM, RNNLMConfig

    tok = load_tokenizer(args.tokenizer)
    texts = []
    manifest = os.path.join(args.data_folder, f"{args.split}.jsonl")
    with open(manifest) as f:
        for line in f:
            texts.extend(json.loads(line)["texts"])
    print(f"{len(texts)} sentences from {manifest}")

    ids = [tok.encode_as_ids(t)[: args.max_len] for t in texts]
    max_len = max(len(s) for s in ids)
    V = tok.vocab_size
    blank = 0
    inputs = np.zeros((len(ids), max_len), np.int32)      # [blank]+toks
    targets = np.zeros((len(ids), max_len), np.int32)
    mask = np.zeros((len(ids), max_len), np.float32)
    for i, s in enumerate(ids):
        inputs[i, 1: len(s)] = s[:-1]
        targets[i, : len(s)] = s
        mask[i, : len(s)] = 1.0

    cfg = RNNLMConfig(vocab_size=V, embedding_dim=args.embedding_dim,
                      hidden_size=args.hidden_size,
                      num_layers=args.num_layers)
    model = RNNLM(cfg)
    params = model.init(jax.random.PRNGKey(0), inputs[:2])
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, m, key):
        def loss_fn(p):
            logits = model.apply(p, x, deterministic=False,
                                 rngs={"dropout": key})
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, y[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    n = len(ids)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        total, count = 0.0, 0
        for lo in range(0, n - args.batch_size + 1, args.batch_size):
            sel = order[lo: lo + args.batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(inputs[sel]),
                jnp.asarray(targets[sel]), jnp.asarray(mask[sel]), sub)
            total += float(loss)
            count += 1
        print(f"epoch {epoch + 1}: nll/token {total / max(count, 1):.4f}")

    import dataclasses

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    payload = {"config": {k: v for k, v in dataclasses.asdict(cfg).items()
                          if k != "dtype"},
               "params": jax.tree.map(np.asarray, dict(params))["params"]}
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    print(f"LM saved to {args.out} (vocab {V})")


if __name__ == "__main__":
    main()
