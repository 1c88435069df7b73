"""PL-regularization fallback at 128 tokens (VERDICT r03 item 7).

The factory routes ``--pl_reg`` runs to the XLA einsum attention
because the Pallas flash kernel's custom VJP linearizes once only
(models/factory.py:46-60); perf-parity of that fallback was measured
at the flagship's 21 tokens.  The reference wires PL only into the
21-token heads (hand_net.py:308-309,395-396 — the 128-token HRNet/
Inception heads have no PL path), so the open question is narrower
than a full protocol: at 128 tokens x 196 dim (the token-head
transformer scale), (a) does the Pallas kernel indeed fail the
double-backward, and (b) what does the PL double-backward cost on the
XLA path there?

Measures, at bs 96 on the 128x196 pyramid transformer (depth 3,
heads 8 — the exact stack inside _TokenRegressorHead):
  1. fwd+bwd WITHOUT PL, XLA attention        (baseline)
  2. fwd+bwd WITHOUT PL, Pallas attention     (kernel baseline)
  3. fwd+bwd WITH the in-graph PL vjp probe + PL loss term, XLA
  4. the same with Pallas — EXPECTED to fail linearization (documented)

Usage: PYTHONPATH=/root/repo python benchmarks/probe_pl_128tok.py
"""

import json
import os
import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from scat_tpu.models.losses import path_length_loss
from scat_tpu.models.transformer import PyramidTransformer
from scat_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
K = 20
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
T, D = 128, 196


class Head128(nn.Module):
    """The _TokenRegressorHead transformer segment with the flagship's
    in-graph PL probe attached (hand_net.py:117-125 pattern)."""

    use_pallas: bool = False
    pl_reg: bool = False
    dtype = jnp.bfloat16

    def setup(self):
        self.transformer = PyramidTransformer(
            dim=D, depth=3, heads=8, dim_head=64, mlp_dim=392,
            use_pallas=self.use_pallas, dtype=self.dtype)

    def _head(self, tokens):
        out = self.transformer(tokens, deterministic=True)
        return out.reshape(out.shape[0], -1).astype(jnp.float32)

    def __call__(self, tokens):
        if self.pl_reg:
            out, vjp_fn = nn.vjp(
                lambda mdl, t: mdl._head(t), self, tokens,
                vjp_variables=False)
            cot = vjp_fn(jnp.ones_like(out))
            pl_grad = cot[-1] if isinstance(cot, tuple) else cot
            return out, pl_grad
        return self._head(tokens), None


def bench(use_pallas: bool, pl_reg: bool):
    model = Head128(use_pallas=use_pallas, pl_reg=pl_reg)
    tok0 = jax.random.normal(jax.random.key(0), (BS, T, D),
                             jnp.float32)
    params = model.init(jax.random.key(1), tok0)["params"]

    def loss_fn(p, tokens):
        out, pl_grad = model.apply({"params": p}, tokens)
        loss = jnp.mean(out ** 2)
        if pl_grad is not None:
            # [B,T,D] probe -> the PL penalty (train.py:178-183 shape
            # conventions via losses.path_length_loss)
            l_pl, _ = path_length_loss(
                pl_grad[:, None], jnp.float32(0.0),
                ema_reset_compat=True)
            loss = loss + 10.0 * l_pl
        return loss

    grad_fn = jax.grad(loss_fn)

    def grad_k(p, seed):
        def body(i, acc):
            tokens = jax.random.normal(
                jax.random.fold_in(jax.random.key(2), seed + i),
                (BS, T, D), jnp.float32)
            g = grad_fn(p, tokens)
            return acc + sum(jnp.sum(x.astype(jnp.float32))
                             for x in jax.tree.leaves(g))
        return jax.lax.fori_loop(0, K, body, 0.0)

    fn = jax.jit(grad_k)
    # float() = host fetch; block_until_ready can return early through
    # the tunnel (probe_hrnet.py's bogus first read)
    float(fn(params, jnp.int32(0)))
    t0 = time.perf_counter()
    float(fn(params, jnp.int32(1)))
    dt1 = (time.perf_counter() - t0) / K
    t0 = time.perf_counter()
    float(fn(params, jnp.int32(2)))
    return min(dt1, (time.perf_counter() - t0) / K) * 1e3


def main():
    rows = []
    for use_pallas in (False, True):
        for pl_reg in (False, True):
            label = {"attention": "pallas" if use_pallas else "xla",
                     "pl_reg": pl_reg}
            try:
                label["fwd_bwd_ms"] = round(bench(use_pallas, pl_reg), 2)
            except Exception as e:   # the documented kernel limitation
                label["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            rows.append(label)
            print(json.dumps(label), flush=True)
    print(json.dumps({"pl_128tok": rows}))


if __name__ == "__main__":
    main()
