"""Scripted on-chip kernel verification (one command, one report).

Compiles and grad-checks every Pallas kernel at its production shapes on the
real TPU (axon backend), including the Mosaic boundary cases that the CPU
suite's interpret mode cannot catch (VERDICT r3 #8; the tiny-attention
H·D = 128 silent-wrong-grads lowering bug is the motivating example — it
passed the whole CPU suite and miscompiled on hardware).

Method: for each case, run the kernel in bf16 and an XLA reference in BOTH
bf16 and fp32; the kernel passes when its max error vs the fp32 truth is
within 4x the bf16 XLA path's own error (i.e. the kernel is as accurate as
any bf16 implementation can be, modulo reduction order), for the output and
for every input gradient.

Tunnel safety: the shared axon chip can hang for minutes-to-hours (CLAUDE.md).
Each case runs in THIS process but the script first probes the tunnel with a
60s-deadline matmul in a subprocess; if the probe times out the script exits 2
("tunnel busy — retry later") instead of hanging.

Usage:
    python tools/verify_kernels.py            # probe, then all cases
    python tools/verify_kernels.py --no-probe # skip the tunnel probe
Exit codes: 0 all pass, 1 failures, 2 tunnel unavailable.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_PROBE = """
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print(float(jnp.sum(x @ x)))
"""

RESULTS = []


def probe_tunnel(timeout_s: int = 120) -> bool:
    try:
        subprocess.run([sys.executable, "-c", _PROBE], timeout=timeout_s,
                       check=True, capture_output=True)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max())


def check(name, kernel_fn, xla_fn, args_bf16, args_f32, grad_argnums):
    """kernel(bf16) vs xla(bf16) vs xla(fp32): outputs + grads."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()

    def scalar(fn, args):
        out = fn(*args)
        # fixed pseudo-random cotangent so every output element matters
        cot = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def outputs_and_grads(fn, args):
        f = jax.jit(lambda *a: (
            fn(*a), jax.grad(lambda *b: scalar(fn, b),
                             argnums=grad_argnums)(*a)))
        out, grads = f(*args)
        return jax.block_until_ready((out, grads))

    try:
        k_out, k_g = outputs_and_grads(kernel_fn, args_bf16)
        x_out, x_g = outputs_and_grads(xla_fn, args_bf16)
        f_out, f_g = outputs_and_grads(xla_fn, args_f32)
    except Exception as e:  # compile or runtime failure IS the finding
        RESULTS.append((name, False, f"EXCEPTION {type(e).__name__}: {e}"))
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        return

    dt = time.time() - t0
    worst = ""
    ok = True
    pairs = [("out", k_out, x_out, f_out)]
    pairs += [(f"grad{j}", kg, xg, fg)
              for j, kg, xg, fg in zip(grad_argnums, k_g, x_g, f_g)]
    for tag, kv, xv, fv in pairs:
        ek = _err(kv, fv)                      # kernel vs fp32 truth
        ex = _err(xv, fv)                      # bf16 XLA vs fp32 truth
        scale = max(float(np.abs(np.asarray(fv, np.float32)).max()), 1e-6)
        # 4x: an independent bf16 reduction order can sit slightly past 3x
        # (measured 3.02x on tiny-cross dv); the miscompiles this script
        # exists to catch are orders of magnitude off (H*D=128 was ~50%)
        bound = max(4.0 * ex, 1e-3 * scale)
        line = f"{tag}: kernel_err={ek:.3e} xla_bf16_err={ex:.3e} bound={bound:.3e}"
        if not np.isfinite(ek) or ek > bound:
            ok = False
            worst += f" [{line}]"
    status = "OK  " if ok else "FAIL"
    print(f"{status} {name} ({dt:.1f}s){worst}", flush=True)
    RESULTS.append((name, ok, worst.strip()))


def flash_cases():
    import jax
    import jax.numpy as jnp
    # NB: ops/__init__.py re-exports the flash_attention *function*, which
    # overwrites the submodule attribute on the package — even
    # `import x2vlm_tpu.ops.flash_attention as fa` binds the function.
    # sys.modules is the only unambiguous handle to the module.
    import x2vlm_tpu.ops.flash_attention  # noqa: F401 (ensure registered)
    fa = sys.modules["x2vlm_tpu.ops.flash_attention"]

    rng = np.random.default_rng(0)

    def mk(B, H, Sq, Skv, D=64, bias_shape=None, masked=False, causal=False):
        def arrs(dt):
            q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), dt)
            k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), dt)
            v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), dt)
            args = [q, k, v]
            if bias_shape is not None:
                args.append(jnp.asarray(
                    rng.standard_normal(bias_shape) * 2.0, dt))
            return tuple(args)

        km = None
        if masked:
            km = jnp.asarray(
                rng.integers(0, 2, (B, Skv)), jnp.int32).at[:, 0].set(1)

        has_bias = bias_shape is not None
        grad_argnums = (0, 1, 2, 3) if has_bias else (0, 1, 2)

        def kernel(*a):
            bias = a[3] if has_bias else None
            return fa._flash(a[0], a[1], a[2], bias, km, causal, D ** -0.5)

        def xla(*a):
            bias = a[3] if has_bias else None
            return fa._xla_attention(a[0], a[1], a[2], bias, km, causal,
                                     D ** -0.5)

        # the bf16 args are reused as fp32 via exact cast (bf16 values are
        # exactly representable in fp32) so both paths see identical inputs
        a16 = arrs(jnp.bfloat16)
        a32 = tuple(x.astype(jnp.float32) for x in a16)
        return kernel, xla, a16, a32, grad_argnums

    H = 12
    yield "flash self 224px (B=128,S=197,rel-pos bias)", mk(
        128, H, 197, 197, bias_shape=(1, H, 197, 197))
    # X2VLM-large towers run 16 heads (vision-large + 1024-wide text stack)
    yield "flash self large (B=16,H=16,S=197,bias)", mk(
        16, 16, 197, 197, bias_shape=(1, 16, 197, 197))
    yield "flash self 384px (B=64,S=577,bias)", mk(
        64, H, 577, 577, bias_shape=(1, H, 577, 577))
    yield "flash self 768px (B=8,S=2305,bias)", mk(
        8, H, 2305, 2305, bias_shape=(1, H, 2305, 2305))
    yield "flash batched bias (B=8,H,Sq,Skv)", mk(
        8, H, 577, 577, bias_shape=(8, H, 577, 577))
    yield "flash dBias VMEM-fit (Skv=2560)", mk(
        4, H, 2560, 2560, bias_shape=(1, H, 2560, 2560))
    yield "flash masked cross (Sq=40,Skv=577)", mk(
        64, H, 40, 577, masked=True)
    yield "flash causal (UniLM decode,S=512)", mk(
        16, H, 512, 512, causal=True)


def tiny_cases():
    import jax
    import jax.numpy as jnp
    from x2vlm_tpu.ops import tiny_attention as ta

    rng = np.random.default_rng(1)

    def mk(B, Sq, Skv, H, D=64, masked=False):
        def arrs(dt):
            return (jnp.asarray(rng.standard_normal((B, Sq, H * D)), dt),
                    jnp.asarray(rng.standard_normal((B, Skv, H * D)), dt),
                    jnp.asarray(rng.standard_normal((B, Skv, H * D)), dt))

        km = None
        if masked:
            km = jnp.asarray(
                rng.integers(0, 2, (B, Skv)), jnp.int32).at[:, 0].set(1)

        def kernel(q, k, v):
            return ta.tiny_block_attention(q, k, v, num_heads=H, key_mask=km)

        def xla(q, k, v):
            qs = q * jnp.asarray(D ** -0.5, q.dtype)
            krow = ta._krow(km) if km is not None else None
            return ta._xla_reference(qs, k, v, krow, None, H)

        a16 = arrs(jnp.bfloat16)
        a32 = tuple(x.astype(jnp.float32) for x in a16)
        return kernel, xla, a16, a32, (0, 1, 2)

    yield "tiny self pretrain (B=128,Sq=Skv=40,H=12)", mk(128, 40, 40, 12)
    # large text stack: 16 heads, H*D = 1024
    yield "tiny self large (B=64,Sq=Skv=40,H=16)", mk(64, 40, 40, 16)
    yield "tiny cross pretrain (B=128,Sq=40,Skv=197)", mk(128, 40, 197, 12)
    yield "tiny masked non-%8 (B=32,Sq=37,Skv=41)", mk(
        32, 37, 41, 12, masked=True)
    # Mosaic lane-width boundary: H*D = 256 is the narrowest measured-correct
    # width (H*D = 128 silently miscompiles the backward and must stay gated)
    yield "tiny lane-width floor (H=4,D=64 -> H*D=256)", mk(64, 40, 40, 4)


def fused_ce_case():
    import jax.numpy as jnp
    from x2vlm_tpu.ops import fused_ce as fc

    rng = np.random.default_rng(2)
    N, D, V = 800, 768, 30522
    labels = jnp.asarray(rng.integers(0, V, N), jnp.int32).at[::7].set(-100)
    valid = jnp.ones((N,), bool)

    def kernel(h, t, b):
        return fc.fused_vocab_ce(h, t, b, labels, valid)[None]

    def xla(h, t, b):
        logits = (h @ t.astype(h.dtype).T + b.astype(h.dtype))
        return fc.softmax_ce(logits.astype(jnp.float32), labels)[None]

    h = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    t = jnp.asarray(rng.standard_normal((V, D)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    a16 = (h, t, b)
    a32 = (h.astype(jnp.float32), t, b)
    return kernel, xla, a16, a32, (0, 1, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-probe", action="store_true")
    args = ap.parse_args()

    if not args.no_probe and not probe_tunnel():
        print("tunnel probe timed out — shared chip busy, retry later")
        sys.exit(2)

    import jax
    from x2vlm_tpu.ops import tiny_attention as ta
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    # gate sanity: the measured-miscompiling width must still be refused
    gate_ok = not ta.tiny_supported(64, 40, 40, 2, 64)
    print(("OK  " if gate_ok else "FAIL") +
          " tiny_supported gate refuses H*D=128", flush=True)
    RESULTS.append(("tiny_supported gate H*D=128", gate_ok, ""))

    for name, case in list(flash_cases()) + list(tiny_cases()) + [
            ("fused vocab CE (N=800,V=30522)", fused_ce_case())]:
        check(name, *case)

    bad = [r for r in RESULTS if not r[1]]
    print(f"\n{len(RESULTS) - len(bad)}/{len(RESULTS)} kernel checks passed")
    if bad:
        for name, _, msg in bad:
            print(f"  FAILED: {name} {msg}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
