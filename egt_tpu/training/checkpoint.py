"""Checkpointing + weight snapshots.

Replaces the reference's `tf.train.Checkpoint`/`CheckpointManager` + `.h5` weight files
(`lib/base/callbacks/checkpoint.py`) with:

  * orbax for the resumable training checkpoint (params + optimizer state + host-side
    training-state counters), max_to_keep=1, saved every epoch;
  * flat-npz weight snapshots as the analog of `SaveWhenCallback`'s weight-only `.h5`
    files (`checkpoint.py:86-138`), including the same 'event;cond;format' mini-DSL.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import numpy as np


# ----------------------------------------------------------- flat weight snapshots


def _flatten_params(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_weights(params, path: str) -> None:
    """Weight-only snapshot (flat npz), the `.h5` analog."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten_params(params)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_weights(params, path: str):
    """Load a flat npz back into the structure of `params` (shape-checked)."""
    flat = dict(np.load(path))
    ref_flat = _flatten_params(params)
    missing = set(ref_flat) - set(flat)
    if missing:
        raise KeyError(f"weight file {path} missing keys: {sorted(missing)[:5]}...")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        arr = flat[prefix[:-1]]
        if arr.shape != np.shape(tree):
            raise ValueError(f"shape mismatch at {prefix[:-1]}: "
                             f"{arr.shape} vs {np.shape(tree)}")
        return arr

    return rebuild(params)


def latest_epoch_snapshot(saved_dir: str) -> str:
    """Find the newest `...epochNNNN.npz` snapshot, mirroring
    `TrainingBase.get_latest_save_file` (`training_base.py:375-388`)."""
    pattern = re.compile(r"(?<=epoch)[0-9]+")
    cur_epoch, cur_file = 0, ""
    d = Path(saved_dir)
    if d.is_dir():
        for fp in d.glob("*.npz"):
            m = pattern.search(fp.name)
            e = 0 if m is None else int(m.group())
            if e > cur_epoch:
                cur_epoch, cur_file = e, str(fp)
    return cur_file


# --------------------------------------------------------------- training checkpoint


class TrainCheckpointer:
    """Orbax-backed resumable checkpoint of {params, opt_state} + a JSON sidecar for
    host-side training state (epoch, global_step, plateau state, lr)."""

    def __init__(self, directory: str, max_to_keep: int = 1):
        import orbax.checkpoint as ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, params, opt_state, train_state: dict) -> None:
        import orbax.checkpoint as ocp
        self.manager.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        self.manager.wait_until_finished()
        with open(self.directory / f"train_state_{step}.json", "w") as fp:
            json.dump(train_state, fp)
        # prune JSON sidecars whose orbax checkpoint was dropped (max_to_keep),
        # keeping every step the manager can still restore
        keep = {f"train_state_{s}.json" for s in self.manager.all_steps()}
        keep.add(f"train_state_{step}.json")
        for old in self.directory.glob("train_state_*.json"):
            if old.name not in keep:
                try:
                    old.unlink()
                except OSError:
                    pass

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, params, opt_state):
        """Restore into the given (template) pytrees; returns
        (params, opt_state, train_state) or None when no checkpoint exists."""
        import orbax.checkpoint as ocp
        step = self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params),
                opt_state=ocp.args.StandardRestore(opt_state),
            ),
        )
        state_file = self.directory / f"train_state_{step}.json"
        train_state = {}
        if state_file.exists():
            with open(state_file) as fp:
                train_state = json.load(fp)
        return restored["params"], restored["opt_state"], train_state

    def close(self):
        self.manager.close()


# ------------------------------------------------------------------- save-when DSL


class SaveWhen:
    """'event;cond;format' (multiple criteria '#'-separated) snapshot rule engine,
    mirroring `SaveWhenCallback` (`checkpoint.py:86-138`). Conditions are evaluated
    against a scope of {logs..., epoch/batch, training-state values}."""

    def __init__(self, saved_dir: str, when: str, verbose: bool = True):
        self.saved_dir = saved_dir
        self.verbose = verbose
        self.criterions = []
        if when:
            for item in when.split("#"):
                event, cond, fmt = (s.strip() for s in item.split(";"))
                self.criterions.append((event.lower(), cond, fmt))

    def maybe_save(self, event: str, scope: dict, params) -> list[str]:
        saved = []
        for e, cond, fmt in self.criterions:
            if e != event:
                continue
            try:
                ok = eval(cond, {"__builtins__": {}}, dict(scope))
            except NameError:
                if self.verbose:
                    print(f"SAVE:{e};{cond}: did not find log, IGNORING",
                          flush=True)
                continue
            if ok:
                fname = fmt.format(**scope) + ".npz"
                path = os.path.join(self.saved_dir, fname)
                save_weights(params, path)
                saved.append(path)
                if self.verbose:
                    print(f"SAVE:{e};{cond}: model saved to {path}", flush=True)
        return saved
