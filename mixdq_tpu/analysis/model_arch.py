"""Model architecture dump/compare tools (counterpart of
analysis_tools/model_arch/{model_structure.py,compare_classes.py,
compare_whole_model.py}): dump the quantizable-layer name space with
shapes to text, diff two dumps."""

from __future__ import annotations

from typing import Dict, List

from ..quant.state import get_layer_kernel, quantizable_layers


def dump_structure(params) -> str:
    """One line per quantizable layer: ``name: shape`` (sorted)."""
    layers = quantizable_layers(params)
    lines = []
    for n in sorted(layers):
        k = get_layer_kernel(params, layers[n])
        lines.append(f"{n}: {tuple(k.shape)}")
    return "\n".join(lines) + "\n"


def compare_structures(a: str, b: str) -> Dict[str, List[str]]:
    """Diff two dumps -> {'only_a', 'only_b', 'shape_mismatch'}."""
    def parse(s):
        out = {}
        for line in s.strip().splitlines():
            if ":" in line:
                name, shape = line.split(":", 1)
                out[name.strip()] = shape.strip()
        return out

    da, db = parse(a), parse(b)
    return {
        "only_a": sorted(set(da) - set(db)),
        "only_b": sorted(set(db) - set(da)),
        "shape_mismatch": sorted(
            n for n in set(da) & set(db) if da[n] != db[n]),
    }
