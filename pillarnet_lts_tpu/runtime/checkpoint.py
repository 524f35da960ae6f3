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
