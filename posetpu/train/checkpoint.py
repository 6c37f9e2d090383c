"""Orbax checkpointing with the reference's three roles.

Mirrors lib/utils/utils.py:87-116 + run/pose2d/train.py:368-397:
(a) per-epoch ``checkpoint`` with model+optimizer state per component and
    epoch/perf metadata (cluster auto-resume);
(b) ``model_best`` tracking by perf indicator;
(c) ``final_state`` at the end of training.

The reference's ``load_checkpoint`` has an undefined-variable bug
(utils.py:94); the intended resume behaviour is implemented here.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


def _as_abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    """Save/restore dicts of TrainState-like pytrees.

    With ``async_save=True`` the disk write runs on a single worker thread
    while training continues. The device->host fetch happens ON THE CALLING
    thread first: fetching device arrays from a second thread concurrently
    with main-thread dispatch DEADLOCKED the axon/TPU backend in a real
    training run (all threads parked, save never progressed past epoch 4 —
    see BUILDLOG round 2) — device access must stay serialized with the
    step stream. One save is in flight at a time, so ordering is preserved;
    ``wait_until_finished`` (called automatically before restore/exists and
    at the next save) joins the worker and re-raises any save error.
    Multi-process runs fall back to synchronous saves (the orbax save is a
    collective; deferring it to per-process threads would skew rendezvous).
    """

    def __init__(self, directory: str, async_save: bool = False):
        self.directory = _as_abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._pool = None
        self._pending = None
        if async_save:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="posetpu-ckpt"
            )

    # -------------------------------------------------------------- save

    def wait_until_finished(self) -> None:
        """Join any in-flight async save (re-raising its error, if any)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()
        self._ckpt.wait_until_finished()

    def _run(self, job, states: dict):
        """Join the previous save, then run ``job(states)`` inline (sync
        mode / multi-process) or on the worker after fetching ``states`` to
        host numpy on THIS thread (async mode)."""
        self.wait_until_finished()
        if self._pool is None or jax.process_count() > 1:
            return job(states)
        import numpy as np

        states = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, states
        )
        self._pending = self._pool.submit(job, states)
        return None

    def _save_sync(self, name: str, states: dict, meta: dict | None) -> str:
        path = os.path.join(self.directory, name)
        self._ckpt.save(path, states, force=True)
        self._ckpt.wait_until_finished()
        if jax.process_index() == 0:  # orbax save is collective; meta is not
            with open(os.path.join(self.directory, f"{name}_meta.json"), "w") as f:
                json.dump(meta or {}, f)
        return path

    def save(self, name: str, states: dict, meta: dict | None = None) -> str:
        self._run(lambda st: self._save_sync(name, st, meta), states)
        return os.path.join(self.directory, name)

    def save_epoch(self, epoch: int, states: dict, perf: float,
                   is_best: bool) -> None:
        """The per-epoch checkpoint + best tracking (train.py:368-390).

        ``model_best`` is a LOCAL directory copy of the just-saved
        checkpoint, not a second device fetch — device->host transfer is
        the dominant checkpoint cost, and the bytes are identical."""
        meta = {"epoch": epoch, "perf": float(perf)}

        def job(states):
            path = self._save_sync("checkpoint", states, meta)
            if is_best and jax.process_index() == 0:
                import shutil

                best = os.path.join(self.directory, "model_best")
                tmp = best + ".copying"
                shutil.rmtree(tmp, ignore_errors=True)
                shutil.copytree(path, tmp)
                shutil.rmtree(best, ignore_errors=True)
                os.replace(tmp, best)
                with open(os.path.join(self.directory, "model_best_meta.json"),
                          "w") as f:
                    json.dump(meta, f)

        self._run(job, states)

    def save_final(self, states: dict) -> None:
        """final_state.pth.tar equivalent (train.py:393-397). Blocks until
        written (it is the last save of the run)."""
        self.save("final_state", states)
        self.wait_until_finished()

    # ----------------------------------------------------------- restore

    def exists(self, name: str = "checkpoint") -> bool:
        self.wait_until_finished()
        return os.path.isdir(os.path.join(self.directory, name))

    def restore(self, name: str, template: dict | None = None) -> tuple[dict, dict]:
        """Restore a checkpoint. With ``template`` (a states dict of pytrees),
        leaves come back with the template's structure/dtypes; without one the
        raw saved tree is returned. Returns (states, meta)."""
        self.wait_until_finished()
        path = os.path.join(self.directory, name)
        if template is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
            states = self._ckpt.restore(path, abstract)
        else:
            states = self._ckpt.restore(path)
        meta_path = os.path.join(self.directory, f"{name}_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return states, meta

    def restore_model(self, name: str = "final_state",
                      keep: tuple = ("params", "batch_stats")) -> dict:
        """Restore ONLY the model subtrees (``keep``) of each saved entry.

        Optimizer/step bytes are never read (``ocp.PLACEHOLDER`` leaves),
        and the item tree is built from the ON-DISK metadata, so the
        restore is decoupled from the saved optimizer tree structure — a
        changed optimizer/schedule between pipeline iterations cannot break
        it. This is the reference's model-only RESUME_PATH semantics
        (run/pose2d/train.py:250-275 loads ``state_dict`` only).
        """
        self.wait_until_finished()
        path = os.path.join(self.directory, name)
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
            tree = ck.metadata(path).item_metadata.tree

            def mark(sub, keep_it):
                return jax.tree.map(
                    lambda _: ocp.RestoreArgs() if keep_it
                    else ocp.PLACEHOLDER, sub)

            item = {
                ename: {k: mark(v, k in keep) for k, v in entry.items()}
                for ename, entry in tree.items()
            }
            states = ck.restore(path, args=ocp.args.PyTreeRestore(item=item))
        return {e: {k: v for k, v in sub.items() if k in keep}
                for e, sub in states.items()}
