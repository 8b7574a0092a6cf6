"""Checkpoint loading: HF safetensors directories -> framework param pytrees.

Production checkpoints are HF-format directories (model*.safetensors +
tokenizer.json) placed under config.checkpoint_dir/<model-name>/.  Loading
is zero-copy per tensor via safetensors' numpy interface, then cast to the
model dtype on device.  Orbax save/restore is layered on top for fast
native-format re-serialization after first conversion.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from vis_tpu.utils.logger import setup_logger

logger = setup_logger(__name__, level="INFO", component="LOADER")


def read_safetensors_dir(ckpt_dir: Path) -> Dict[str, Any]:
    """Merge all *.safetensors files in a directory into one numpy state dict."""
    from safetensors import safe_open

    state: Dict[str, Any] = {}
    files = sorted(Path(ckpt_dir).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {ckpt_dir}")
    for file in files:
        with safe_open(str(file), framework="numpy") as fh:
            for name in fh.keys():
                state[name] = fh.get_tensor(name)
    logger.info(f"Loaded {len(state)} tensors from {len(files)} shards in {ckpt_dir}")
    return state


def find_checkpoint(model_name: str, checkpoint_root: Path) -> Optional[Path]:
    """Locate a checkpoint dir for a model id like 'Qwen/Qwen2-VL-7B-Instruct'."""
    candidates = [
        checkpoint_root / model_name.replace("/", "__"),
        checkpoint_root / model_name.split("/")[-1],
        checkpoint_root / model_name,
    ]
    for cand in candidates:
        if cand.is_dir() and any(cand.glob("*.safetensors")):
            return cand
    return None


def save_orbax(params: Any, path: Path) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).resolve(), params, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: Path, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve(), like)


__all__ = ["read_safetensors_dir", "find_checkpoint", "save_orbax", "load_orbax"]
