"""Checkpoint/resume for long searches and MPC sweeps.

The reference has no persistence beyond RLE strings (SURVEY.md section
5.4); here any pytree of solver state (board batches, control logits, RNG
keys, incumbents) round-trips through orbax, and RLE import/export remains
available for interop with Golly and the reference."""

from __future__ import annotations

from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path, state):
    """Save a pytree of arrays to ``path`` (a directory)."""
    path = Path(path).absolute()
    _checkpointer().save(path, state, force=True)


def restore(path, template=None):
    """Restore a pytree saved by :func:`save`.  Pass ``template`` (a pytree
    of like-shaped arrays) to get exact dtypes/shardings back."""
    path = Path(path).absolute()
    if template is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(
            path, restore_args=ocp.checkpoint_utils.construct_restore_args(template)
        )
    return _checkpointer().restore(path)


def save_rle(path, packed_board):
    """Interop escape hatch: write a board as Golly RLE."""
    from ..core import rle

    Path(path).write_text(rle.to_rle(packed_board) + "\n")


def load_rle(path):
    from ..core import rle

    return rle.parse(Path(path).read_text())
