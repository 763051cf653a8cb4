"""Character language model on TinyShakespeare — fast transformer
integration workload.

Parity: reference CharLM sample (Samples/CharLM/Src/CharLM.cpp:273-465:
training loop with CE loss + perplexity; CharTransformer.ixx config), with
TPU-native upgrades: fused device loss, KV-cache sampling.

Usage: python examples/charlm_train.py [--steps N] [--sample N]
"""

from __future__ import annotations

import argparse
import math
import time

import jax
import jax.numpy as jnp

import mila_tpu
from mila_tpu.data import CharReader, load_tiny_shakespeare
from mila_tpu.inference import Generator, SamplingConfig
from mila_tpu.models.gpt2 import GPT2, GPT2Config
from mila_tpu.optim import AdamW, AdamWConfig, warmup_cosine
from mila_tpu.ops import softmax_cross_entropy
from mila_tpu.utils.logging import Logger


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--sample", type=int, default=200, help="chars to sample at end")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default="", help="save final weights here")
    ap.add_argument(
        "--quant-eval", action="store_true",
        help="report BF16 vs INT8 weight-only perplexity delta (BASELINE gate)",
    )
    # Model-size overrides: the reference's CharTransformer hits < 2.0 train
    # perplexity with a larger config than the quick-demo default
    # (ROADMAP.md:351); expose size so the target is reachable from the CLI.
    ap.add_argument("--layers", type=int, default=0, help="0 = char_lm preset")
    ap.add_argument("--dim", type=int, default=0)
    ap.add_argument("--heads", type=int, default=0)
    args = ap.parse_args()

    mila_tpu.initialize(seed=args.seed)
    text = load_tiny_shakespeare()
    if text is None:
        Logger.error("TinyShakespeare corpus not found")
        return 2
    reader = CharReader(text, args.batch_size, args.seq_len, seed=args.seed)
    V = reader.vocab.size
    Logger.info("corpus: {} chars, vocab {}", len(text), V)

    cfg = GPT2Config.char_lm(vocab_size=V).replace(max_seq_len=max(args.seq_len * 2, 256))
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    if args.dim:
        cfg = cfg.replace(embedding_dim=args.dim)
    if args.heads:
        cfg = cfg.replace(num_heads=args.heads)
    model = GPT2(cfg)
    params = model.init(jax.random.key(args.seed), (args.batch_size, args.seq_len))
    opt = AdamW(AdamWConfig(learning_rate=args.lr, grad_clip_norm=1.0))
    opt_state = opt.init(params)
    sched = warmup_cosine(args.lr, args.steps // 10 + 1, args.steps)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    Logger.info("model parameters: {:,}", n_params)

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply(p, xb)
            return softmax_cross_entropy(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.step(opt_state, params, grads, lr=sched(opt_state.step))
        return params, opt_state, loss

    t0 = time.monotonic()
    step = 0
    tokens_seen = 0
    while step < args.steps:
        reader.reset()
        for xb, yb in reader:
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(xb), jnp.asarray(yb)
            )
            tokens_seen += xb.size
            if step % 50 == 0:
                ppl = math.exp(min(float(loss), 20.0))
                Logger.info("step {}: loss={:.4f} perplexity={:.3f}", step, float(loss), ppl)
            step += 1
            if step >= args.steps:
                break
    dt = time.monotonic() - t0
    final_ppl = math.exp(min(float(loss), 20.0))
    print(f"final loss {float(loss):.4f}, char perplexity {final_ppl:.3f} "
          f"(reference target < 2.0 after full training)")
    print(f"throughput: {tokens_seen / dt:,.0f} tokens/sec")

    if args.checkpoint:
        from mila_tpu.models.export import export_model

        export_model(args.checkpoint, model, params)
        Logger.info("weights exported to {}", args.checkpoint)

    if args.quant_eval:
        from mila_tpu.inference.quantize import quantize_model_params
        from mila_tpu.models.evaluation import perplexity_delta

        val = CharReader(text, 16, args.seq_len, shuffle=False, seed=123)

        def batches():
            for i in range(8):
                yield val.next_batch(i)

        # BASELINE gate across every weight-only dtype the engine serves.
        for qdt in ("int8", "fp8_e4m3", "int4"):
            qparams = quantize_model_params(params, qdt, min_size=4096)
            report = perplexity_delta(model, params, qparams, batches)
            print(
                f"quantization gate [{qdt}]: ppl bf16={report['ppl_ref']:.4f} "
                f"{qdt}={report['ppl_test']:.4f} delta={report['delta']:+.4f} "
                f"({report['rel_delta']*100:+.2f}%)"
            )

    if args.sample > 0:
        gen = Generator(model, params, max_len=cfg.max_seq_len)
        prompt = jnp.asarray(reader.vocab.encode("ROMEO:"), jnp.int32)[None]
        out = gen.generate(
            prompt, args.sample, key=jax.random.key(0),
            sampling=SamplingConfig(temperature=0.8, top_k=40),
        )
        print("--- sample ---")
        print(reader.vocab.decode(jax.device_get(out[0])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
