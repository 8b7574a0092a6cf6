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


_CACHE_VERSION = "v1"  # bump when converter output layouts change


def source_stamp(ckpt_dir: Path) -> Dict[str, Any]:
    """Identity of a checkpoint's source files: a cached conversion is
    valid only while every shard (and config.json) is byte-identical."""
    ckpt_dir = Path(ckpt_dir)
    files = sorted(ckpt_dir.glob("*.safetensors")) + [
        p for p in (ckpt_dir / "config.json",) if p.exists()
    ]
    return {
        "version": _CACHE_VERSION,
        "files": {
            p.name: [p.stat().st_size, p.stat().st_mtime_ns] for p in files
        },
    }


def save_converted_cache(params: Any, cache_dir: Path,
                         stamp: Dict[str, Any]) -> None:
    """Persist a converted param pytree: leaves via Orbax (flat, keyed by
    index) + the pickled treedef, so restore needs no target template and
    reproduces the exact container structure (tuples, dataclasses)."""
    import json
    import pickle

    import jax

    cache_dir = Path(cache_dir)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    save_orbax(
        {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)},
        cache_dir / "leaves",
    )
    (cache_dir / "treedef.pkl").write_bytes(pickle.dumps(treedef))
    (cache_dir / "SOURCE_STAMP.json").write_text(json.dumps(stamp))


def load_converted_cache(cache_dir: Path,
                         stamp: Dict[str, Any]) -> Optional[Any]:
    """Restore a cached conversion; None on miss or stale source stamp."""
    import json
    import pickle

    import jax

    cache_dir = Path(cache_dir)
    stamp_file = cache_dir / "SOURCE_STAMP.json"
    treedef_file = cache_dir / "treedef.pkl"
    if not (stamp_file.exists() and treedef_file.exists()):
        return None
    try:
        if json.loads(stamp_file.read_text()) != stamp:
            logger.info(f"Orbax conversion cache stale at {cache_dir}")
            return None
        import orbax.checkpoint as ocp

        flat = ocp.StandardCheckpointer().restore(
            (cache_dir / "leaves").resolve()
        )
        leaves = [flat[k] for k in sorted(flat)]
        treedef = pickle.loads(treedef_file.read_bytes())
        return jax.tree_util.tree_unflatten(treedef, leaves)
    except Exception as exc:  # corrupt cache falls back to reconversion
        logger.warning(f"Orbax conversion cache unreadable ({exc}); "
                       "reconverting from safetensors")
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


__all__ = [
    "read_safetensors_dir",
    "find_checkpoint",
    "source_stamp",
    "save_converted_cache",
    "load_converted_cache",
    "save_orbax",
    "load_orbax",
]
