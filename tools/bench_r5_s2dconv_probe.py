"""Round-5 probe #9: phase-aligned Pallas s2d conv vs the XLA s2d stage.

The serving-shape stage ledger (tools/archive/bench_r5_stage8_probe.py)
puts conv1 at +7.8 ms/frame (int8, bs=8, untiled) — the largest single
conv stage, sitting at the s2d recast's structural 4x padded-FLOP floor.
The phase-ALIGNED recast (expand_kernel_s2d_aligned, 1.78x fine FLOPs at
full lanes) was measured-and-rejected in round 3 ONLY because XLA
materializes the per-conv phase realign; ops/pallas/s2d_conv_kernel.py
moves that realign into VMEM where it is shared by all four tap matmuls.

This probe builds the stage-1 structure standalone (ResNet-34: BlockV =
conv0 + residual pair, then 2 more residual blocks = 7 SubM convs) with
random calibrated int8 weights and a realistic-occupancy mask, asserts
the two implementations agree bit-exactly ON CHIP, then times them
interleaved (3 rounds, per-round dispatch floors) at the serving shape
(8, 720, 720, 128).

Variants: xla (shipped conv_bn_act_s2d math), pallas_th8/16/32 (kernel
H-band tile sweep; th=64 measured OOM: 96M of register spills in VMEM).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, HC, WC, C = 8, 720, 720, 32


def main():
    import jax

    # honor JAX_PLATFORMS=cpu for the logic smoke (sitecustomize
    # force-registers the TPU plugin and overrides the env var)
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    cpu = jax.default_backend() == "cpu"  # logic smoke (tiny, interpreted)
    global B, HC, WC
    if cpu:
        B, HC, WC = 2, 24, 24

    from pillarnet_lts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from pillarnet_lts_tpu.models.backbones.base import (
        _tile4,
        conv_core_int8,
        expand_kernel_s2d,
        expand_kernel_s2d_aligned,
        quantize_act,
    )
    from pillarnet_lts_tpu.ops.pallas.s2d_conv_kernel import s2d_subm_conv_int8

    rng = np.random.RandomState(0)

    # 7 convs: (fine int8 kernel, inv scale of input, dq vector, sh vector)
    convs = []
    for i in range(7):
        kf = rng.randn(3, 3, C, C).astype(np.float32) * 0.2
        s_w = np.maximum(np.abs(kf).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        kq = np.clip(np.round(kf / s_w), -127, 127).astype(np.int8)
        s_x = np.float32(0.05 + 0.01 * i)
        inv = rng.rand(C).astype(np.float32) * 0.05 + 0.02
        shift = (rng.randn(C) * 0.05).astype(np.float32)
        dq = np.tile(s_x * s_w.astype(np.float32) * inv, 4)
        sh = np.tile(shift, 4)
        convs.append(
            (
                jnp.asarray(kq),
                jnp.float32(s_x),
                jnp.asarray(dq),
                jnp.asarray(sh),
            )
        )

    occ = rng.rand(B, HC, WC, 4) < 0.077  # per-phase ~ fine occupancy
    mask4 = jnp.asarray(occ)
    x0 = jnp.asarray(
        (rng.randn(B, HC, WC, 4 * C) * occ.repeat(C, axis=-1)).astype(
            np.float32
        ),
        jnp.bfloat16,
    )

    NEG = -float("inf")

    def xla_conv(x, conv, act, residual=None, rezero="addneg"):
        kq, s_x, dq, sh = conv
        yq = conv_core_int8(
            quantize_act(x, s_x), expand_kernel_s2d(kq), 1, ((1, 1), (1, 1))
        )
        y = (yq.astype(jnp.float32) * dq + sh).astype(jnp.bfloat16)
        if rezero == "addneg":
            y = y + jnp.repeat(
                jnp.where(mask4, 0.0, NEG), C, axis=-1
            ).astype(y.dtype)
        else:
            y = y * jnp.repeat(mask4, C, axis=-1).astype(y.dtype)
        if residual is not None:
            y = y + residual
        return jax.nn.relu(y) if (act or residual is not None) else y

    def stage_xla(x):
        # BlockV
        h = xla_conv(x, convs[0], act=False, rezero="mul")
        ident = h
        h = xla_conv(h, convs[1], act=True)
        h = xla_conv(h, convs[2], act=False, residual=ident)
        # 2 residual blocks
        for b in range(2):
            ident = h
            h = xla_conv(h, convs[3 + 2 * b], act=True)
            h = xla_conv(h, convs[4 + 2 * b], act=False, residual=ident)
        return h

    def make_pallas_stage(tile_h):
        wals = [expand_kernel_s2d_aligned(kq) for kq, _, _, _ in convs]

        def pl_conv(x, i, act, residual=None):
            _, s_x, dq, sh = convs[i]
            return s2d_subm_conv_int8(
                x, wals[i], 1.0 / s_x, dq, sh, mask4, act=act,
                residual=residual, tile_h=tile_h, interpret=cpu,
            )

        def stage(x):
            h = pl_conv(x, 0, act=False)
            ident = h
            h = pl_conv(h, 1, act=True)
            h = pl_conv(h, 2, act=False, residual=ident)
            for b in range(2):
                ident = h
                h = pl_conv(h, 3 + 2 * b, act=True)
                h = pl_conv(h, 4 + 2 * b, act=False, residual=ident)
            return h

        return stage

    from pillarnet_lts_tpu.ops.pallas.s2d_conv_kernel import s2d_stage_int8

    def make_fused_stage(tile_h):
        w_stack = jnp.stack(
            [expand_kernel_s2d_aligned(kq) for kq, _, _, _ in convs]
        )
        p_stack = jnp.stack(
            [
                jnp.stack(
                    [dq, sh, jnp.full((128,), 1.0 / s_x, jnp.float32)]
                )
                for _, s_x, dq, sh in convs
            ]
        )
        def stage(x):
            # maskc is built IN-graph: as a closed-over jit constant the
            # (B, Hc, Wc, 128) bf16 array serializes into the compile
            # payload (950 MB at the serving shape -> remote HTTP 413)
            maskc = jnp.repeat(mask4, C, axis=-1).astype(jnp.bfloat16)
            return s2d_stage_int8(
                x, w_stack, p_stack, maskc, tile_h=tile_h, interpret=cpu
            )

        return stage

    # variant names on argv override the default sweep. th=64 (single-conv)
    # measured OOM at the serving shape: Mosaic register-allocator spill
    # slots alone need 96M VMEM (8/20 log), so sweeps stay <= 32.
    fns = {"xla": stage_xla}
    for th in (8, 16, 32):
        fns[f"pallas_th{th}"] = make_pallas_stage(th)
        fns[f"fused_th{th}"] = make_fused_stage(th)
    names = sys.argv[1:] or ["xla", "pallas_th8", "pallas_th16",
                             "pallas_th32"]
    variants = [(n, jax.jit(fns[n])) for n in names]

    outs = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        o = fn(x0)
        o.block_until_ready()
        print(f"[compile+run] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[name] = np.asarray(o[:1], np.float32)  # one frame for equality

    ok = True
    for name in list(outs)[1:]:
        eq = np.array_equal(outs["xla"], outs[name])
        md = float(np.abs(outs["xla"] - outs[name]).max())
        print(f"[equality] {name} vs xla: exact={eq} maxdiff={md}",
              flush=True)
        ok &= eq
    if not ok:
        print("[equality] MISMATCH — timings below are not comparable",
              flush=True)
    if cpu:
        return  # logic smoke only: interpret-mode timings are meaningless

    tiny = jax.jit(lambda a: (a + 1).sum())
    z = jnp.ones((8, 128))
    float(np.asarray(tiny(z)))

    def floor_now():
        fl = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fl.append(time.perf_counter() - t0)
        return float(np.median(fl))

    res = {n: [] for n, _ in variants}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.1f}"]
        for name, fn in variants:
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn(x0).block_until_ready()
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000 / B
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms on-chip/frame", flush=True)

    med = {n: float(np.median(v)) for n, v in res.items()}
    print("[split] " + " ".join(f"{n}={v:.2f}" for n, v in med.items()),
          flush=True)


if __name__ == "__main__":
    main()
