"""Zero-copy deployment checkpoint container.

The deployment-format role of the reference's ``new_ckpt.pth``
(kernels/convert_ckpt.py) — but mmap-able: a JSON index followed by
64-byte-aligned raw blobs, read back as numpy memmaps (no deserialize
copy of multi-GB int8 weights). 4-bit layers store packed int4 (two
codes/byte via the native packer), halving checkpoint size vs int8.

Layout: [u64 magic][u64 index_len][index JSON][pad64][blob0][pad64]...
Index entries: {name: {dtype, shape, offset, nbytes, packed_int4}}.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional

import numpy as np

from . import pack_int4, unpack_int4

MAGIC = 0x4D495844515453


def save_tensors(tensors: Dict[str, np.ndarray], path: str,
                 pack4_names: Optional[set] = None) -> None:
    """``pack4_names``: tensor names whose int8 codes fit int4 and should
    be stored packed."""
    pack4_names = pack4_names or set()
    index: Dict[str, Any] = {}
    blobs = []
    offset = 0

    def align(o):
        return (o + 63) & ~63

    payload = []
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        packed = False
        if name in pack4_names and arr.dtype == np.int8:
            data = pack_int4(arr)
            packed = True
        else:
            data = np.ascontiguousarray(arr)
        payload.append((name, arr, data, packed))

    # compute offsets after index size is known; iterate: index json size
    # depends on offsets -> use fixed-width offsets by building index with
    # placeholder then recompute (two passes, offsets relative to data
    # start).
    rel = 0
    for name, arr, data, packed in payload:
        rel = align(rel)
        index[name] = {
            "dtype": str(arr.dtype), "shape": list(arr.shape),
            "offset": rel, "nbytes": int(data.nbytes),
            "packed_int4": packed,
        }
        rel += data.nbytes

    idx_bytes = json.dumps(index).encode()
    header = struct.pack("<QQ", MAGIC, len(idx_bytes))
    data_start = align(16 + len(idx_bytes))

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        f.write(idx_bytes)
        f.write(b"\0" * (data_start - 16 - len(idx_bytes)))
        pos = 0
        for name, arr, data, packed in payload:
            target = index[name]["offset"]
            f.write(b"\0" * (target - pos))
            f.write(data.tobytes() if not data.flags["C_CONTIGUOUS"]
                    else memoryview(data).cast("B"))
            pos = target + data.nbytes


def load_tensors(path: str, mmap: bool = True) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        magic, idx_len = struct.unpack("<QQ", f.read(16))
        assert magic == MAGIC, f"bad magic in {path}"
        index = json.loads(f.read(idx_len))
    data_start = (16 + idx_len + 63) & ~63
    raw = np.memmap(path, dtype=np.uint8, mode="r") if mmap else \
        np.fromfile(path, dtype=np.uint8)

    out = {}
    for name, meta in index.items():
        off = data_start + meta["offset"]
        buf = raw[off : off + meta["nbytes"]]
        if meta["packed_int4"]:
            n = int(np.prod(meta["shape"]))
            arr = unpack_int4(np.asarray(buf), n).reshape(meta["shape"])
        else:
            arr = np.frombuffer(buf, dtype=np.dtype(meta["dtype"])).reshape(
                meta["shape"])
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# Deploy-dict (DeployEntry pytree) serialization
# ---------------------------------------------------------------------------


def save_deploy_ckpt(deploy: Dict[str, Any], path: str,
                     w4_layers: Optional[set] = None) -> None:
    """Flatten a {layer: DeployEntry} dict into the container.
    ``w4_layers``: layers whose w_int codes are 4-bit (packed storage)."""
    w4_layers = w4_layers or set()
    tensors: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    pack4 = set()

    def add_entry(prefix, e, layer):
        meta[prefix] = {"kind": e.kind, "split": e.split}
        for f in ("w_int", "scale", "bias0", "scale_inv", "zp_shifted"):
            v = getattr(e, f)
            if v is not None:
                key = f"{prefix}::{f}"
                if str(getattr(v, "dtype", "")) == "int4":
                    import jax.numpy as jnp

                    v = v.astype(jnp.int8)
                    meta[prefix].setdefault("int4_fields", []).append(f)
                    pack4.add(key)
                tensors[key] = np.asarray(v)
                if f == "w_int" and layer in w4_layers:
                    pack4.add(key)
        if e.part0 is not None:
            add_entry(prefix + "::part0", e.part0, layer)
            add_entry(prefix + "::part1", e.part1, layer)

    for layer, e in deploy.items():
        add_entry(layer, e, layer)
    tensors["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    save_tensors(tensors, path, pack4)


def load_deploy_ckpt(path: str) -> Dict[str, Any]:
    from ..quant.deploy import DeployEntry
    import jax.numpy as jnp

    tensors = load_tensors(path)
    meta = json.loads(bytes(np.asarray(tensors.pop("__meta__"))).decode())

    def build(prefix):
        m = meta[prefix]
        kw = {}
        for f in ("w_int", "scale", "bias0", "scale_inv", "zp_shifted"):
            key = f"{prefix}::{f}"
            if key in tensors:
                arr = jnp.asarray(tensors[key])
                if f in m.get("int4_fields", []):
                    arr = arr.astype(jnp.int4)
                kw[f] = arr
        if f"{prefix}::part0" in meta:
            kw["part0"] = build(f"{prefix}::part0")
            kw["part1"] = build(f"{prefix}::part1")
        return DeployEntry(kind=m["kind"], split=m["split"], **kw)

    return {layer: build(layer) for layer in meta if "::" not in layer}
