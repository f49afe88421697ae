"""Convert fcd_torch's pretrained ChemNet to the diffspectra_tpu npz format.

Run this ONCE in any environment that has ``fcd_torch`` (or the ``fcd``
package) installed — e.g. the reference's conda env (ref env.sh) — then copy
the output to ``diffspectra_tpu/data/chemnet.npz`` (or export
``DIFFSPECTRA_CHEMNET_NPZ=<path>``).  After that,
``evaluation/mose_metric.py`` reports the REAL FCD under the 'FCD' key
(ref evaluation/mose_metric.py:1,131-154).

    python tools/convert_chemnet.py --out chemnet.npz

The converter walks the torch ``nn.Sequential`` and emits one manifest entry
per parameterised layer:

- ``nn.Conv1d``  -> kind=conv1d, kernel transposed to [K, I, O] (jax WIO)
- ``nn.LSTM``    -> kind=lstm/bilstm; torch gate order (i, f, g, o) matches
  the JAX cell in evaluation/chemnet.py; weight_ih [4H, I] -> W [I, 4H],
  weight_hh [4H, H] -> U [H, 4H], bias = bias_ih + bias_hh
- ``nn.Linear``  -> kind=dense, weight [O, I] -> kernel [I, O]
- activation modules (SELU/Tanh/ReLU) attach to the previous entry

The SMILES vocabulary and pad length are read from the fcd package so the
tokenisation of record ships inside the npz, not in code.

Verification: after conversion the script pushes a batch of SMILES through
both models and asserts max |delta| < 1e-4 on the activations.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _find_fcd():
    try:
        import fcd_torch as fcd_mod
        return fcd_mod, "fcd_torch"
    except ImportError:
        pass
    try:
        import fcd as fcd_mod
        return fcd_mod, "fcd"
    except ImportError:
        raise SystemExit(
            "Neither fcd_torch nor fcd is installed — run this converter in "
            "the reference environment (ref env.sh)."
        )


def _layer_entries(seq, params):
    """Walk a torch nn.Sequential, yielding manifest entries + params."""
    import torch.nn as nn

    entries = []
    idx = 0
    for mod in seq:
        cls = type(mod).__name__
        if isinstance(mod, nn.Conv1d):
            name = f"conv{idx}"
            # torch conv1d weight: [O, I, K] -> WIO [K, I, O]
            params[f"{name}.kernel"] = (
                mod.weight.detach().numpy().transpose(2, 1, 0)
            )
            params[f"{name}.bias"] = mod.bias.detach().numpy()
            entries.append(
                {"kind": "conv1d", "name": name,
                 "stride": int(mod.stride[0]), "k": int(mod.kernel_size[0])}
            )
            idx += 1
        elif isinstance(mod, nn.LSTM):
            name = f"lstm{idx}"
            kind = "bilstm" if mod.bidirectional else "lstm"
            params[f"{name}.W"] = mod.weight_ih_l0.detach().numpy().T
            params[f"{name}.U"] = mod.weight_hh_l0.detach().numpy().T
            params[f"{name}.b"] = (
                mod.bias_ih_l0 + mod.bias_hh_l0
            ).detach().numpy()
            if mod.bidirectional:
                params[f"{name}.W_rev"] = (
                    mod.weight_ih_l0_reverse.detach().numpy().T
                )
                params[f"{name}.U_rev"] = (
                    mod.weight_hh_l0_reverse.detach().numpy().T
                )
                params[f"{name}.b_rev"] = (
                    mod.bias_ih_l0_reverse + mod.bias_hh_l0_reverse
                ).detach().numpy()
            entries.append({"kind": kind, "name": name, "last_only": True})
            idx += 1
        elif isinstance(mod, nn.Linear):
            name = f"dense{idx}"
            params[f"{name}.kernel"] = mod.weight.detach().numpy().T
            params[f"{name}.bias"] = mod.bias.detach().numpy()
            entries.append({"kind": "dense", "name": name})
            idx += 1
        elif cls in ("SELU", "Tanh", "ReLU") and entries:
            entries[-1]["activation"] = cls.lower()
        else:
            # structural helpers (Transpose/Reverse/IndexTuple/padding):
            # the jax layers handle layout natively; record for audit
            entries.append({"kind": "noop", "name": f"skip_{cls}_{idx}"})
    return [e for e in entries if e["kind"] != "noop"], params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="chemnet.npz")
    ap.add_argument("--check-smiles", nargs="*",
                    default=["CCO", "c1ccccc1", "CC(=O)O"])
    args = ap.parse_args()

    fcd_mod, pkg = _find_fcd()
    if pkg == "fcd_torch":
        fcd_obj = fcd_mod.FCD(device="cpu", n_jobs=1)
        torch_model = fcd_obj.model
        # the vocabulary lives in utils (checked below); there is no sane
        # fallback on the FCD object itself — get_one_hot.__defaults__ holds
        # default ARGUMENT values (e.g. pad_len), not a vocab
        vocab = None
        from fcd_torch.utils import SmilesDataset  # noqa: F401
    else:
        torch_model = fcd_mod.load_ref_model()
        vocab = None
    try:
        from fcd_torch import utils as fu
    except ImportError:
        from fcd import utils as fu
    vocab = getattr(fu, "__vocab", None) or getattr(fu, "VOCAB", None) or vocab
    pad_len = getattr(fu, "__pad_len", None) or 350
    if vocab is None:
        raise SystemExit(
            "Could not read the SMILES vocabulary from the fcd package — "
            "inspect its utils module and pass the vocab manually."
        )

    params: dict = {}
    entries, params = _layer_entries(torch_model, params)
    manifest = {"vocab": list(vocab), "pad_len": int(pad_len),
                "layers": entries}

    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from diffspectra_tpu.evaluation.chemnet import ChemNet, one_hot_batch

    net = ChemNet(manifest, {k: np.asarray(v) for k, v in params.items()})

    # parity check torch vs jax BEFORE writing: a half-converted npz on disk
    # is worse than none (run_lib picks it up silently)
    import torch

    ours = net.features(args.check_smiles, batch_size=len(args.check_smiles))
    x = torch.tensor(one_hot_batch(args.check_smiles, net.vocab, net.pad_len))
    with torch.no_grad():
        theirs = torch_model(x).numpy()
    delta = float(np.abs(ours - theirs).max())
    print(f"torch-vs-jax max |delta| = {delta:.2e}")
    assert delta < 1e-4, "conversion parity check failed"

    net.save(args.out)
    print(f"wrote {args.out}: {len(entries)} layers, vocab={len(vocab)}")


if __name__ == "__main__":
    main()
