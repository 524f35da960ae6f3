"""Generate the committed golden-parity fixtures (tests/fixtures/golden_r2.npz).

Every golden output is computed by an INDEPENDENT numpy implementation of
the reference formulas (file:line cited inline) — no imports from
pillarnet_lts_tpu's compute path. The test suite replays the same inputs
through the jax modules and asserts stage-by-stage closeness:

  1. PFE: point->pillar coords, Δcenter features, Linear+BN1d(+stats over
     valid points)+ReLU MLP, scatter-max grid
     (`det3d/models/readers/dynamic_pillar_encoder.py:34-43`,
      `det3d/ops/pillar_ops/pillar_utils.py:50-56`, `pillar_modules.py:26-74`).
  2. Sparse backbone block (SubM convs + BN1d-over-active-rows + residual,
     `det3d/models/backbones/base.py:145-213`) and a strided SparseConv2d
     stage entry (occupancy dilation, `base.py:38-63`).
  3. CenterHead dense decode (`det3d/models/bbox_heads/center_head.py:306-326`).
  4. Greedy rotated NMS keep-set on 2500 clustered candidates
     (`det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:280-390` semantics),
     with IoU from the round-1 angular-sort formulation so the committed
     keep-set is independent of the round-2 Green clipping path.

The point cloud is range-concentrated (radial ~ exp) like a real lidar
scan, not uniform.

Run: python tools/make_golden_fixtures.py   (writes/overwrites the npz)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fixture generation is host work — never touch the (single, shared) TPU.
# The axon sitecustomize overrides JAX_PLATFORMS, so force CPU in-process.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_r2.npz",
)

PC_RANGE = np.array([-16.0, -16.0, -3.0, 16.0, 16.0, 3.0], np.float32)
PILLAR = 0.25  # -> 128 x 128 grid
H = W = 128
C_MLP = 16
EPS_BN = 1e-3


def make_cloud(rng, n=4096):
    """Range-concentrated scan: radius ~ exponential mixture + box clusters."""
    r = np.minimum(rng.exponential(6.0, n) + 0.5, 21.0)
    th = rng.uniform(-np.pi, np.pi, n)
    x = r * np.cos(th)
    y = r * np.sin(th)
    # clusters (objects) at a few spots
    for cx, cy in [(4, 2), (-6, 5), (8, -7), (-3, -9)]:
        m = rng.choice(n, 160, replace=False)
        x[m] = cx + rng.randn(160) * 0.8
        y[m] = cy + rng.randn(160) * 0.8
    z = rng.uniform(-2.0, 1.0, n)
    inten = rng.rand(n)
    tlag = rng.uniform(0, 0.45, n)
    return np.stack([x, y, z, inten, tlag], axis=1).astype(np.float32)


def pfe_golden(points, w, gamma, beta, run_mean, run_var):
    """Reference PFE math in numpy. Returns (grid, occ, batch_mean, batch_var,
    feats, valid) — batch stats are the masked train-mode statistics."""
    x, y = points[:, 0], points[:, 1]
    cx = np.floor((x - PC_RANGE[0]) / PILLAR).astype(np.int64)
    cy = np.floor((y - PC_RANGE[1]) / PILLAR).astype(np.int64)
    valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)

    x_off = PILLAR / 2 + PC_RANGE[0]
    y_off = PILLAR / 2 + PC_RANGE[1]
    center_x = cx * PILLAR + x_off
    center_y = cy * PILLAR + y_off
    feats = np.concatenate(
        [(x - center_x)[:, None], (y - center_y)[:, None], points], axis=1
    ).astype(np.float32)  # (N, 7) — Δcenter first (`pillar_utils.py:56`)
    feats = feats * valid[:, None]

    h = feats @ w  # Linear bias=False (`pillar_modules.py:26-33`)
    # BN1d over the stacked VALID points (reference runs the MLP on the
    # compacted (L, C) rows — masked statistics here are equivalent)
    hv = h[valid]
    mean = hv.mean(axis=0)
    var = hv.var(axis=0)  # biased, used for normalization (torch semantics)
    hn = (h - mean) / np.sqrt(var + EPS_BN) * gamma + beta
    hn = np.maximum(hn, 0.0) * valid[:, None]

    grid = np.zeros((H, W, C_MLP), np.float32)
    occ = np.zeros((H, W), bool)
    flat = cy[valid] * W + cx[valid]
    hvn = hn[valid]
    for i in np.argsort(flat, kind="stable"):
        r, c = flat[i] // W, flat[i] % W
        if not occ[r, c]:
            occ[r, c] = True
            grid[r, c] = hvn[i]
        else:
            grid[r, c] = np.maximum(grid[r, c], hvn[i])
    return grid, occ, mean, var


def subm_conv_sparse(x, mask, w, b):
    """SubM conv by explicit neighbor gather over ACTIVE sites only
    (`base.py:38-63` indice-preserving rule). x zeroed at inactive sites."""
    Hh, Ww, Cin = x.shape
    Cout = w.shape[-1]
    out = np.zeros((Hh, Ww, Cout), np.float32)
    ii, jj = np.nonzero(mask)
    for ki in range(3):
        for kj in range(3):
            ni = ii + ki - 1
            nj = jj + kj - 1
            ok = (ni >= 0) & (ni < Hh) & (nj >= 0) & (nj < Ww)
            src = np.zeros((len(ii), Cin), np.float32)
            sel = ok.nonzero()[0]
            src[sel] = x[ni[sel], nj[sel]]
            src[sel] *= mask[ni[sel], nj[sel]][:, None]
            out[ii, jj] += src @ w[ki, kj]
    if b is not None:
        out[ii, jj] += b
    return out


def strided_conv_sparse(x, mask, w):
    """SparseConv2d k=3 s=2 p=1: output site active iff any input site in
    its receptive field is active (`base.py:38-63` regular conv rule)."""
    Hh, Ww, Cin = x.shape
    Cout = w.shape[-1]
    Ho, Wo = Hh // 2, Ww // 2
    out = np.zeros((Ho, Wo, Cout), np.float32)
    occ = np.zeros((Ho, Wo), bool)
    for oi in range(Ho):
        for oj in range(Wo):
            acc = np.zeros(Cout, np.float32)
            active = False
            for ki in range(3):
                for kj in range(3):
                    si, sj = oi * 2 + ki - 1, oj * 2 + kj - 1
                    if 0 <= si < Hh and 0 <= sj < Ww and mask[si, sj]:
                        active = True
                        acc += x[si, sj] @ w[ki, kj]
            if active:
                occ[oi, oj] = True
                out[oi, oj] = acc
    return out, occ


def bn_active(x, mask, gamma, beta):
    """BN1d over active rows (`base.py:122-130` applies BN to .features);
    returns normalized map (re-zeroed at inactive) + batch stats."""
    rows = x[mask]
    mean = rows.mean(axis=0)
    var = rows.var(axis=0)
    y = (x - mean) / np.sqrt(var + EPS_BN) * gamma + beta
    return y * mask[..., None], mean, var


def decode_golden(reg, hei, dim, rot, stride):
    """Dense decode (`center_head.py:306-326`)."""
    B, Hh, Ww, _ = dim.shape
    bd = np.exp(np.clip(dim, -1.2, 3.2))
    br = np.arctan2(rot[..., 0:1], rot[..., 1:2])
    ys, xs = np.meshgrid(np.arange(Hh), np.arange(Ww), indexing="ij")
    xs = xs[None, ..., None] + reg[..., 0:1]
    ys = ys[None, ..., None] + reg[..., 1:2]
    xs = xs * stride * PILLAR + PC_RANGE[0]
    ys = ys * stride * PILLAR + PC_RANGE[1]
    return np.concatenate([xs, ys, hei, bd, br], axis=-1).astype(np.float32)


def main():
    rng = np.random.RandomState(42)
    out = {}

    # ---- 1. PFE ----
    points = make_cloud(rng)
    w_mlp = (rng.randn(7, C_MLP) * 0.3).astype(np.float32)
    gamma = rng.uniform(0.7, 1.3, C_MLP).astype(np.float32)
    beta = (rng.randn(C_MLP) * 0.1).astype(np.float32)
    grid, occ, bmean, bvar = pfe_golden(points, w_mlp, gamma, beta, None,
                                        None)
    out.update(
        points=points, w_mlp=w_mlp, mlp_gamma=gamma, mlp_beta=beta,
        pfe_grid=grid, pfe_occ=occ, pfe_bn_mean=bmean, pfe_bn_var=bvar,
    )
    print(f"PFE: {occ.sum()} active pillars "
          f"({100 * occ.mean():.1f}% occupancy)")

    # ---- 2. backbone block: SubMConv+BN+ReLU x2 with residual
    #         (Sparse2DBasicBlock, `base.py:183-213`) ----
    w1 = (rng.randn(3, 3, C_MLP, C_MLP) * 0.15).astype(np.float32)
    b1 = (rng.randn(C_MLP) * 0.05).astype(np.float32)
    w2 = (rng.randn(3, 3, C_MLP, C_MLP) * 0.15).astype(np.float32)
    b2 = (rng.randn(C_MLP) * 0.05).astype(np.float32)
    g1 = rng.uniform(0.8, 1.2, C_MLP).astype(np.float32)
    be1 = (rng.randn(C_MLP) * 0.05).astype(np.float32)
    g2 = rng.uniform(0.8, 1.2, C_MLP).astype(np.float32)
    be2 = (rng.randn(C_MLP) * 0.05).astype(np.float32)

    y = subm_conv_sparse(grid, occ, w1, b1)
    y, m1, v1 = bn_active(y, occ, g1, be1)
    y = np.maximum(y, 0.0)
    y = subm_conv_sparse(y, occ, w2, b2)
    y, m2, v2 = bn_active(y, occ, g2, be2)
    block_out = np.maximum(y + grid, 0.0)  # residual + relu (`base.py:205-213`)
    out.update(
        blk_w1=w1, blk_b1=b1, blk_w2=w2, blk_b2=b2,
        blk_g1=g1, blk_be1=be1, blk_g2=g2, blk_be2=be2,
        blk_out=block_out, blk_bn1_mean=m1, blk_bn1_var=v1,
        blk_bn2_mean=m2, blk_bn2_var=v2,
    )

    # ---- 3. strided stage entry (SparseConv2d + BN + ReLU,
    #         `PillarResNet.py:86-94`) ----
    wd = (rng.randn(3, 3, C_MLP, 2 * C_MLP) * 0.15).astype(np.float32)
    gd = rng.uniform(0.8, 1.2, 2 * C_MLP).astype(np.float32)
    bd = (rng.randn(2 * C_MLP) * 0.05).astype(np.float32)
    yd, occ_d = strided_conv_sparse(block_out, occ, wd)
    yd, md, vd = bn_active(yd, occ_d, gd, bd)
    down_out = np.maximum(yd, 0.0)
    out.update(
        down_w=wd, down_g=gd, down_b=bd, down_out=down_out,
        down_occ=occ_d, down_bn_mean=md, down_bn_var=vd,
    )
    print(f"down stage: {occ_d.sum()} active "
          f"({100 * occ_d.mean():.1f}% occupancy at stride 2)")

    # ---- 4. decode ----
    Hh = Ww = 16  # stride-8 map of the 128 grid
    reg = rng.rand(1, Hh, Ww, 2).astype(np.float32)
    hei = rng.randn(1, Hh, Ww, 1).astype(np.float32)
    dim = (rng.randn(1, Hh, Ww, 3) * 0.8).astype(np.float32)
    rot = rng.randn(1, Hh, Ww, 2).astype(np.float32)
    boxes_dec = decode_golden(reg, hei, dim, rot, stride=8)
    out.update(dec_reg=reg, dec_hei=hei, dec_dim=dim, dec_rot=rot,
               dec_boxes=boxes_dec)

    # ---- 5. greedy rotated NMS keep-set at production scale ----
    sys.path.insert(0, os.path.dirname(OUT))
    import jax.numpy as jnp

    from pillarnet_lts_tpu.ops.iou3d import (
        _convex_intersection_area_sorted, box_corners_bev, to_pcdet_bev,
    )

    K = 2500
    nb = np.zeros((K, 7), np.float32)
    # realistic pre-NMS candidates: jittered duplicates of ~40 true objects
    # (in-cluster IoU high, cross-cluster ~0 -> the threshold band is sparse)
    n_obj = 40
    proto = np.zeros((n_obj, 7), np.float32)
    proto[:, 0:2] = rng.uniform(-14, 14, (n_obj, 2))
    proto[:, 3:5] = rng.uniform(1.6, 5.0, (n_obj, 2))
    proto[:, 5] = rng.uniform(1.2, 2.5, n_obj)
    proto[:, 6] = rng.uniform(-np.pi, np.pi, n_obj)
    pick = rng.randint(0, n_obj, K)
    nb[:] = proto[pick]
    nb[:, 0:2] += rng.randn(K, 2) * 0.3
    nb[:, 3:5] *= rng.uniform(0.93, 1.07, (K, 2))
    nb[:, 6] += rng.randn(K) * 0.12

    def pairwise_iou(boxes):
        corners = box_corners_bev(to_pcdet_bev(jnp.asarray(boxes)))
        areas = boxes[:, 3] * boxes[:, 4]
        k = boxes.shape[0]
        iou = np.zeros((k, k), np.float32)
        ch = 250
        for i0 in range(0, k, ch):
            hi = min(i0 + ch, k)
            a = jnp.broadcast_to(corners[i0:hi, None], (hi - i0, k, 4, 2))
            b = jnp.broadcast_to(corners[None, :], (hi - i0, k, 4, 2))
            inter = np.asarray(_convex_intersection_area_sorted(a, b))
            iou[i0:hi] = inter / np.maximum(
                areas[i0:hi, None] + areas[None, :] - inter, 1e-8
            )
        return iou

    thresh = 0.2
    # the committed keep-set must be robust to fp differences between IoU
    # implementations: drop boxes involved in near-threshold pairs until a
    # clean margin band remains
    band = 2e-3
    iou = pairwise_iou(nb)
    for _ in range(6):
        margin = np.abs(iou - thresh)
        np.fill_diagonal(margin, 1.0)
        bad_i, bad_j = np.nonzero(np.triu(margin < band, 1))
        if len(bad_i) == 0:
            break
        drop = np.unique(bad_j)  # drop the later (lower-score) box per pair
        keep_rows = np.setdiff1d(np.arange(nb.shape[0]), drop)
        nb = nb[keep_rows]
        iou = iou[np.ix_(keep_rows, keep_rows)]
    K = nb.shape[0]
    scores = np.sort(rng.rand(K).astype(np.float32))[::-1].copy()
    margin = np.abs(iou - thresh)
    np.fill_diagonal(margin, 1.0)
    assert margin.min() > band, f"borderline pair (margin {margin.min()})"
    print(f"NMS fixture: {K} candidates after borderline pruning")

    suppressed = np.zeros(K, bool)
    for i in range(K):  # sequential greedy (`iou3d_nms_kernel.cu:280-390`)
        if suppressed[i]:
            continue
        suppressed |= (iou[i] > thresh) & (np.arange(K) > i)
    keep = ~suppressed
    out.update(nms_boxes=nb, nms_scores=scores, nms_keep=keep)
    print(f"NMS: {keep.sum()} of {K} kept; min |iou-thresh| margin "
          f"{margin.min():.2e}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
