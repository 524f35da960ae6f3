"""Checkpoint I/O (orbax).

Replaces torch `save_checkpoint`/`load_checkpoint`
(`det3d/torchie/trainer/checkpoint.py:166-260`). Parity behaviors kept:

- checkpoint meta embeds epoch, global iter, the full config text, and class
  names (`tools/train.py:155-159`);
- a `latest` pointer file mirrors the reference's `latest.pth` symlink
  (`trainer.py:350-356`).
"""

import json
import os

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir, epoch):
    return os.path.abspath(os.path.join(work_dir, f"epoch_{epoch}"))


def save_checkpoint(work_dir, state, epoch, meta=None):
    path = _ckpt_dir(work_dir, epoch)
    ckptr = ocp.PyTreeCheckpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    with open(os.path.join(work_dir, "latest"), "w") as f:
        f.write(f"epoch_{epoch}")
    return path


def latest_checkpoint(work_dir):
    pointer = os.path.join(work_dir, "latest")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(work_dir, name)
    return path if os.path.exists(path) else None


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def load_pretrained(variables, path, subtree=None, logger=None):
    """Non-strict finetune/bootstrap restore.

    Mirrors the reference's `load_checkpoint(model, pretrained, strict=False)`
    (`det3d/torchie/trainer/checkpoint.py:166-219`, used by
    `single_stage.py:31-38`) and the Pillar R-CNN recipe of initializing the
    frozen first stage from a trained PillarNet checkpoint
    (`pillar_rcnn.py:20-23`): every params/batch_stats leaf of the source
    checkpoint is copied into `variables` where the (optionally remapped)
    path exists with a matching shape; everything else keeps its initialized
    value. Missing/unexpected keys are reported, not fatal.

    Args:
      variables: target {'params': ..., 'batch_stats': ...} pytree (host or
        device arrays).
      path: checkpoint directory written by `save_checkpoint` (a TrainState
        or a bare variables dict).
      subtree: optional module path prepended to source keys, e.g.
        "single_det" loads a PillarNet checkpoint into PillarRCNN's first
        stage (whose flax scope nests the same module names below it).
    Returns:
      (variables, report) — report has 'loaded', 'missing', 'unexpected',
      'shape_mismatch' path lists.
    """
    import numpy as np

    log = logger or __import__("logging").getLogger("checkpoint")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    if not isinstance(restored, dict) or "params" not in restored:
        raise ValueError(f"{path} does not look like a saved TrainState")

    sub = tuple(subtree.split("/")) if subtree else ()
    target = {
        "params": jax.tree_util.tree_map(lambda x: x, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            lambda x: x, variables.get("batch_stats", {})
        ),
    }
    flat_tgt = _flatten(target)
    report = {"loaded": [], "missing": [], "unexpected": [],
              "shape_mismatch": []}

    for col in ("params", "batch_stats"):
        src_flat = _flatten(restored.get(col) or {}, prefix=(col,))
        for p, leaf in src_flat.items():
            tgt_path = (p[0],) + sub + p[1:]
            if tgt_path not in flat_tgt:
                report["unexpected"].append("/".join(p))
                continue
            if tuple(np.shape(leaf)) != tuple(np.shape(flat_tgt[tgt_path])):
                report["shape_mismatch"].append("/".join(p))
                continue
            _set_path(target, tgt_path, jax.numpy.asarray(leaf))
            flat_tgt.pop(tgt_path)
            report["loaded"].append("/".join(tgt_path))

    # remaining target keys under the subtree were not provided by the source
    for p in flat_tgt:
        if p[1:len(sub) + 1] == sub:
            report["missing"].append("/".join(p))

    log.info(
        "pretrained %s: loaded %d leaves into %s (%d missing, %d unexpected, "
        "%d shape-mismatched)", path, len(report["loaded"]), subtree or "/",
        len(report["missing"]), len(report["unexpected"]),
        len(report["shape_mismatch"]),
    )
    out = dict(variables)
    out["params"] = target["params"]
    if "batch_stats" in variables:
        out["batch_stats"] = target["batch_stats"]
    return out, report


def load_checkpoint(path, target_state=None):
    """Restore a checkpoint. Returns (state, meta)."""
    ckptr = ocp.PyTreeCheckpointer()
    if target_state is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(
            jax.device_get(target_state)
        )
        state = ckptr.restore(
            os.path.abspath(path),
            item=jax.device_get(target_state),
            restore_args=restore_args,
        )
    else:
        state = ckptr.restore(os.path.abspath(path))
    meta = None
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
