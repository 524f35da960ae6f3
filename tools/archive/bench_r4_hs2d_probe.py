"""Round-4 on-chip probe: H-only space-to-depth for the 64-channel stage.

Hypothesis: stage 2 (9x 64-ch SubM convs at 720^2, W-tiled to
(8, 720, 104, 64)) runs far off its FLOP roofline (int8 ~6.6 ms vs ~1-2 ms
bound) because 64 output channels use half the MXU lanes AND the physical
lane dimension pads 64 -> 128, doubling every conv's HBM bytes. An H-only
factor-2 space-to-depth recast ((8, 360, 104, 128), expanded (3,3,128,128)
kernels with the 2t+q-p phase structure) is an exact-cycles wash on the MXU
(2x FLOPs at 2x lane utilization) but halves the physical activation bytes
and doubles the matmul M-tile occupancy. Measure, don't argue:

  fine_bf16    relu(conv(x) * mask) x9 at (8, 720, 104, 64)
  hs2d_bf16    same math in the packed form (numerics checked vs fine)
  fine_int8    quantize -> int8 conv -> dequant -> mask -> relu x9
  hs2d_int8    packed int8 (the deploy-path shape that decides)

Same-session interleaved rounds; every number read against the per-round
dispatch floor (the relay drifts 24-41 ms, docs/ROADMAP.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def expand_kernel_h(w):
    """(3, 3, C, C) fine stride-1 kernel -> (3, 3, 2C, 2C) H-packed kernel.

    Packed row r holds fine rows (2r, 2r+1) as channel blocks q in {0, 1};
    output phase p at coarse tap t needs fine tap dy = 2t + q - p, zero
    where |dy| > 1 (each phase uses 2 of the 3 coarse H-taps).
    """
    import jax.numpy as jnp

    C = w.shape[2]
    blocks = []
    for t in (-1, 0, 1):
        row_q = []
        for q in (0, 1):
            col_p = []
            for p in (0, 1):
                dy = 2 * t + q - p
                if -1 <= dy <= 1:
                    col_p.append(w[dy + 1])
                else:
                    col_p.append(jnp.zeros_like(w[0]))
            row_q.append(jnp.concatenate(col_p, axis=-1))  # (3, C, 2C)
        blocks.append(jnp.concatenate(row_q, axis=-2)[None])  # (1,3,2C,2C)
    return jnp.concatenate(blocks, axis=0)


def pack_h(x):
    """(B, H, W, C) -> (B, H//2, W, 2C), phase-major channel blocks."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W, C).transpose(0, 1, 3, 2, 4).reshape(
        B, H // 2, W, 2 * C
    )


def unpack_h(x, C):
    B, Hc, W, _ = x.shape
    return x.reshape(B, Hc, W, 2, C).transpose(0, 1, 3, 2, 4).reshape(
        B, Hc * 2, W, C
    )


def main():
    import jax

    if "--selftest" in sys.argv:
        # numerics-only run on tiny shapes; the environment's sitecustomize
        # overrides JAX_PLATFORMS, so force the platform via jax.config
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def tiny(x):
        return (x + 1).sum()

    z = jnp.ones((8, 128))
    float(np.asarray(tiny(z)))

    def floor_now():
        fs = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    if "--selftest" in sys.argv:
        B, H, W, C, NCONV = 2, 16, 12, 8, 3
    else:
        B, H, W, C, NCONV = 8, 720, 104, 64, 9
    key = jax.random.PRNGKey(0)
    x0 = jax.jit(lambda k: jax.nn.relu(
        jax.random.normal(k, (B, H, W, C), jnp.bfloat16)))(key)
    wts = jax.jit(lambda k: jax.random.normal(
        k, (NCONV, 3, 3, C, C), jnp.float32) * 0.05)(key)
    mask = jax.jit(lambda k: jax.random.uniform(k, (B, H, W)) > 0.92)(key)
    jax.block_until_ready((x0, wts, mask))

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_i8(xq, wq):
        return lax.conv_general_dilated(
            xq, wq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def q8(x, s):
        q = jnp.round(x.astype(jnp.float32) * (1.0 / s))
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

    S_X, S_W = 0.05, 0.01

    @jax.jit
    def fine_bf16(x, ws, m):
        mb = m.astype(jnp.bfloat16)[..., None]
        for i in range(NCONV):
            x = jax.nn.relu(conv(x, ws[i]) * mb)
        return x, x.astype(jnp.float32).sum()

    @jax.jit
    def hs2d_bf16(x, ws, m):
        xp = pack_h(x)
        pm = pack_h(m.astype(jnp.bfloat16)[..., None])  # (B, H/2, W, 2)
        mp = jnp.repeat(pm, C, axis=-1)  # phase blocks broadcast per C
        for i in range(NCONV):
            xp = jax.nn.relu(conv(xp, expand_kernel_h(ws[i])) * mp)
        x = unpack_h(xp, C)
        return x, x.astype(jnp.float32).sum()

    @jax.jit
    def fine_int8(x, ws, m):
        mb = m.astype(jnp.bfloat16)[..., None]
        for i in range(NCONV):
            wq = jnp.clip(jnp.round(ws[i] / S_W), -127, 127).astype(jnp.int8)
            y = conv_i8(q8(x, S_X), wq).astype(jnp.float32) * (S_X * S_W)
            x = jax.nn.relu(y.astype(jnp.bfloat16) * mb)
        return x, x.astype(jnp.float32).sum()

    @jax.jit
    def hs2d_int8(x, ws, m):
        xp = pack_h(x)
        pm = pack_h(m.astype(jnp.bfloat16)[..., None])
        mp = jnp.repeat(pm, C, axis=-1)
        for i in range(NCONV):
            wq = jnp.clip(jnp.round(ws[i] / S_W), -127, 127).astype(jnp.int8)
            y = conv_i8(q8(xp, S_X), expand_kernel_h(wq)).astype(
                jnp.float32) * (S_X * S_W)
            xp = jax.nn.relu(y.astype(jnp.bfloat16) * mp)
        x = unpack_h(xp, C)
        return x, x.astype(jnp.float32).sum()

    fns = {"fine_bf16": fine_bf16, "hs2d_bf16": hs2d_bf16,
           "fine_int8": fine_int8, "hs2d_int8": hs2d_int8}

    outs = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        try:
            o, _ = fn(x0, wts, mask)
            jax.block_until_ready(o)
        except Exception as e:
            print(f"[compile] {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:250]}", flush=True)
            fns[name] = None
            continue
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[name] = np.asarray(o.astype(jnp.float32))

    for pair in (("fine_bf16", "hs2d_bf16"), ("fine_int8", "hs2d_int8")):
        if pair[0] in outs and pair[1] in outs:
            d = float(np.max(np.abs(outs[pair[0]] - outs[pair[1]])))
            r = float(np.max(np.abs(outs[pair[0]])))
            print(f"[numerics] {pair[1]} vs {pair[0]}: max abs diff "
                  f"{d:.3e} (max |ref| {r:.3e})", flush=True)

    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f} ms"]
        for name, fn in fns.items():
            if fn is None:
                continue
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(np.asarray(fn(x0, wts, mask)[1]))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            line.append(f"{name} {(med - floor) * 1000:.2f}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
