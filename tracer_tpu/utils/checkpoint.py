"""Engine-state checkpoint / resume.

The reference's only persistence is the opaque state value threaded
through the C API (SURVEY.md section 5: "the state is the checkpoint").
Our state is a pytree, so checkpointing is a flatten + savez; progressive
accumulation (img + n_frames + nonce) resumes exactly where it stopped.

Checkpoints are STANDALONE: the pytree structure (treedef — which
encodes every static field and the nested Camera/Scene/accel dataclass
layout) is serialized alongside the leaves, so `load(path)` restores in
a fresh process with no template state and no re-init of the scene.
"""

from __future__ import annotations

import io
import json
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from tracer_tpu.engine.state import EngineState


class _TreedefUnpickler(pickle.Unpickler):
    """Restricted unpickler for the stored treedef: a PyTreeDef pickle
    only references the jax pytree machinery and this package's struct
    classes (verified with pickletools), so everything else — i.e. the
    arbitrary-code-execution surface of a stock ``pickle.loads`` on an
    untrusted checkpoint file — is refused."""

    _JAX_NAMES = {"PyTreeDef", "default_registry"}

    def find_class(self, module: str, name: str):
        if module.startswith("tracer_tpu."):
            return super().find_class(module, name)
        if (name in self._JAX_NAMES
                and (module.startswith("jax.") or module.startswith("jax._src")
                     or module.startswith("jaxlib"))):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint treedef references disallowed global "
            f"{module}.{name}")


def _loads_treedef(b: bytes):
    return _TreedefUnpickler(io.BytesIO(b)).load()

# v1: leaves only, load() required a template for the treedef.
# v2: + pickled treedef -> standalone restore.
_FORMAT_VERSION = 2


def _static_fields(state: EngineState) -> dict:
    return {
        "width": state.width, "height": state.height,
        "subsampling": state.subsampling,
        "render_mode": state.render_mode,
        "transmitter_kind": state.transmitter_kind,
        "cam_conf_id": state.cam_conf_id,
    }


def save(path: str, state: EngineState) -> None:
    """Write the full engine state (scene included) to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    static = {"version": _FORMAT_VERSION, **_static_fields(state)}
    np.savez_compressed(
        path,
        __static__=np.frombuffer(json.dumps(static).encode(), dtype=np.uint8),
        __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load(path: str, template: EngineState | None = None) -> EngineState:
    """Restore a state saved by save().

    Standalone: the treedef stored in the checkpoint rebuilds the exact
    pytree (static fields included) with no template. Passing a template
    additionally cross-checks its static configuration against the
    checkpoint (and is the only way to read version-1 files, which did
    not store a treedef).
    """
    data = np.load(path)
    static = json.loads(bytes(data["__static__"]).decode())
    version = static.get("version")
    if version not in (1, _FORMAT_VERSION):
        raise ValueError(f"unsupported checkpoint version {static}")

    if "__treedef__" in data:
        treedef = _loads_treedef(bytes(data["__treedef__"]))
    elif template is not None:
        treedef = jax.tree.flatten(template)[1]
    else:
        raise ValueError("version-1 checkpoint has no stored treedef; "
                         "pass a template state (same scene/static config)")

    n_leaves = treedef.num_leaves
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n_leaves)]
    state = jax.tree.unflatten(treedef, restored)

    for k, v in _static_fields(state).items():
        if v != static[k]:
            raise ValueError(
                f"checkpoint static field {k}={static[k]} does not match "
                f"restored state {v}")
    if template is not None:
        for k, v in _static_fields(template).items():
            if v != static[k]:
                raise ValueError(
                    f"checkpoint static field {k}={static[k]} does not "
                    f"match template {v}")
    return state
