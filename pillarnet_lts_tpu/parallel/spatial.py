"""Spatial (BEV-grid) sharding with halo exchange — the TPU-native
context-parallel analog (SURVEY.md §5.7).

The reference scales spatial resolution with sparse convolutions on one GPU;
on TPU pods the natural axis is to shard the BEV grid's H dimension across
devices and exchange one-row halos over ICI per 3x3 conv. This module
provides the building blocks under `shard_map`:

- `halo_exchange_h`: ppermute the boundary rows to both neighbors.
- `sharded_conv3x3`: halo + VALID conv == the unsharded SAME conv.
- `sharded_subm_conv3x3`: the masked (SubM-semantics) variant — halo rows of
  both features and occupancy travel together so sparse semantics hold
  across shard boundaries.

Validated against single-device convs on an 8-device CPU mesh
(`tests/test_spatial_sharding.py`).

The production path is `pin_spatial` (GSPMD): the detector annotates the BEV
grid with an H-axis sharding constraint under a mesh context
(`model.spatial_axis` config flag) and XLA's SPMD partitioner inserts the
same halo exchanges automatically — the manual blocks above document and
cross-check the collective pattern.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange_h(x_local, axis_name="sp"):
    """x_local (B, H_loc, W, C) -> (B, H_loc + 2, W, C) with one halo row
    from each neighbor (zeros at the global boundary)."""
    n = jax.lax.axis_size(axis_name)
    top_row = x_local[:, :1]
    bot_row = x_local[:, -1:]

    # send my bottom row to the next device (it becomes their top halo)
    from_prev = jax.lax.ppermute(
        bot_row, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my top row to the previous device (their bottom halo)
    from_next = jax.lax.ppermute(
        top_row, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    idx = jax.lax.axis_index(axis_name)
    zero = jnp.zeros_like(top_row)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x_local, from_next], axis=1)


def _conv3x3_valid(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # VALID on H (halo provides it), SAME on W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def sharded_conv3x3(x_local, kernel, axis_name="sp"):
    """3x3 SAME conv over an H-sharded map: halo exchange + VALID-H conv."""
    xh = halo_exchange_h(x_local, axis_name)
    return _conv3x3_valid(xh, kernel)


def sharded_subm_conv3x3(x_local, mask_local, kernel, axis_name="sp"):
    """SubM-semantics conv on an H-sharded masked-dense map: inactive sites
    stay exactly zero; halo carries neighbor activations so boundary sites
    see the same receptive field as the unsharded conv."""
    y = sharded_conv3x3(x_local, kernel, axis_name)
    return y * mask_local[..., None].astype(y.dtype)


def pin_spatial(x, axis_name, h_dim=1):
    """Constrain a BEV-grid array (B, H, W, C) or mask (B, H, W) to be
    H-sharded over `axis_name` (GSPMD spatial parallelism, SURVEY §5.7).

    Must run under a mesh context (`jax.set_mesh` / `with mesh:`) that
    defines `axis_name`; XLA then partitions every conv over the grid and
    inserts the halo exchanges that `sharded_conv3x3` writes by hand.
    """
    spec = [None] * x.ndim
    spec[h_dim] = axis_name
    return jax.lax.with_sharding_constraint(x, P(*spec))


def pin_spatial_tree(feats, axis_name):
    """Pin a backbone feature dict {name: (features, mask|None)}."""
    out = {}
    for k, (x, m) in feats.items():
        out[k] = (
            pin_spatial(x, axis_name),
            pin_spatial(m, axis_name) if m is not None else None,
        )
    return out


def make_spatial_conv(mesh: Mesh, kernel, axis_name="sp", masked=False):
    """jit-ready H-sharded conv: (B, H, W, C) sharded on H -> same sharding."""
    in_specs = (P(None, axis_name, None, None),)
    if masked:
        in_specs = in_specs + (P(None, axis_name, None),)
    fn = sharded_subm_conv3x3 if masked else sharded_conv3x3

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    def run(*args):
        return fn(*args, kernel, axis_name=axis_name)

    return run
