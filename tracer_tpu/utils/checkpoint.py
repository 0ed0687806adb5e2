"""Engine-state checkpoint / resume.

The reference's only persistence is the opaque state value threaded
through the C API (SURVEY.md section 5: "the state is the checkpoint").
Our state is a pytree, so checkpointing is a flatten + savez; progressive
accumulation (img + n_frames + nonce) resumes exactly where it stopped.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from tracer_tpu.engine.state import EngineState

_FORMAT_VERSION = 1


def save(path: str, state: EngineState) -> None:
    """Write the full engine state (scene included) to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    static = {
        "version": _FORMAT_VERSION,
        "width": state.width, "height": state.height,
        "subsampling": state.subsampling,
        "render_mode": state.render_mode,
        "transmitter_kind": state.transmitter_kind,
        "cam_conf_id": state.cam_conf_id,
    }
    np.savez_compressed(
        path,
        __static__=np.frombuffer(json.dumps(static).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load(path: str, template: EngineState | None = None) -> EngineState:
    """Restore a state saved by save().

    A template state with matching static configuration provides the
    treedef; when omitted, one is rebuilt by re-initializing from the
    stored static fields is not possible without the scene, so a
    template (e.g. a fresh init of the same scene) is required whenever
    the caller does not still hold one.
    """
    data = np.load(path)
    static = json.loads(bytes(data["__static__"]).decode())
    if static.get("version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {static}")
    if template is None:
        raise ValueError("checkpoint.load requires a template state "
                         "(same scene/static config)")
    leaves, treedef = jax.tree.flatten(template)
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    state = jax.tree.unflatten(treedef, restored)
    for k in ("width", "height", "subsampling", "render_mode",
              "transmitter_kind", "cam_conf_id"):
        if getattr(state, k) != static[k]:
            raise ValueError(
                f"checkpoint static field {k}={static[k]} does not match "
                f"template {getattr(state, k)}")
    return state
