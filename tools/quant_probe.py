#!/usr/bin/env python
"""Micro-probe: does int8 conv/matmul lower to the MXU on this chip, and
at what speedup over bf16?

De-risks the int8 serving path (VERDICT r4 item 8) before wiring it through
the model: times one representative ResNet-shape conv and one attention-shape
matmul in bf16 vs s8xs8->s32, and checks the quantized numerics against
fp32 (per-output-channel weight scales, per-tensor dynamic activation scale).

Usage: python tools/quant_probe.py [--platform cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes: numerics-only check on the 1-core "
                         "CPU host (full shapes are ~155 GFLOP per conv)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from egorear_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    rng = np.random.default_rng(0)

    def bench(fn, *xs):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # ---- representative conv: ResNet layer2-ish, B=64 frames x 4 views ----
    if args.small:
        B, H, W, Cin, Cout = 4, 16, 16, 16, 32
    else:
        B, H, W, Cin, Cout = 256, 64, 64, 64, 128
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)) * 0.05, jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x, k):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    # per-channel weight scale, per-tensor dynamic activation scale
    ks = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0
    kq = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)

    def conv_int8(x, kq, ks):
        sa = jnp.max(jnp.abs(x)) / 127.0
        xq = jnp.clip(jnp.round(x / sa), -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, kq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (sa * ks)

    ref = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                   dimension_numbers=dn)
    got = jax.jit(conv_int8)(x, kq, ks)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    t_bf16 = bench(conv_bf16, x, k)
    t_int8 = bench(conv_int8, x, kq, ks)
    print(f"conv {x.shape}x{k.shape}: bf16 {t_bf16:.3f} ms  "
          f"int8 {t_int8:.3f} ms  speedup {t_bf16 / t_int8:.2f}x  "
          f"rel_err {rel:.4f}", flush=True)

    # ---- weight-only variant (dequant to bf16, no act quant) ----
    def conv_w8(x, kq, ks):
        kd = (kq.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16))
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), kd, (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    t_w8 = bench(conv_w8, x, kq, ks)
    print(f"conv weight-only-int8: {t_w8:.3f} ms "
          f"(vs bf16 {t_bf16:.3f})", flush=True)

    # ---- representative matmul: attention/FFN shape ----
    if args.small:
        M, K, N = 64, 32, 48
    else:
        M, K, N = 4096, 512, 2048
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    bs = jnp.max(jnp.abs(b), axis=0) / 127.0
    bq = jnp.clip(jnp.round(b / bs), -127, 127).astype(jnp.int8)

    def mm_bf16(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def mm_int8(a, bq, bs):
        sa = jnp.max(jnp.abs(a)) / 127.0
        aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
        y = lax.dot_general(aq, bq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (sa * bs)

    refm = a @ b
    gotm = jax.jit(mm_int8)(a, bq, bs)
    relm = float(jnp.linalg.norm(gotm - refm) / jnp.linalg.norm(refm))
    t_mb = bench(mm_bf16, a, b)
    t_mi = bench(mm_int8, a, bq, bs)
    print(f"matmul {M}x{K}x{N}: bf16 {t_mb:.3f} ms  int8 {t_mi:.3f} ms  "
          f"speedup {t_mb / t_mi:.2f}x  rel_err {relm:.4f}", flush=True)


if __name__ == "__main__":
    main()
