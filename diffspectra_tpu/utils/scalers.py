"""Data (inverse) normalisation and self-conditioning post-processing.

Pure-function rewrite of the reference's closures (ref: utils.py:33-150).
The scaling recipe: one-hots are centered to [-1, 1] then divided by
per-channel factors '1, 4, 4, 1' (pos, atom types, formal charge, edges),
all masked.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def parse_normalize_factors(normalize_factors) -> Sequence[float]:
    """'1, 4, 4, 1' -> (1., 4., 4., 1.); a 3-tuple gets edge_norm=1
    (ref: utils.py:36-46)."""
    if isinstance(normalize_factors, str):
        factors = [float(x) for x in normalize_factors.split(",")]
    else:
        factors = [float(x) for x in normalize_factors]
    if len(factors) == 3:
        factors = factors + [1.0]
    return tuple(factors)


def get_data_scaler(config):
    """Forward normaliser (ref: utils.py:33-68)."""
    pos_norm, atom_type_norm, fc_norm, edge_norm = parse_normalize_factors(
        config.model.normalize_factors
    )
    centered = config.data.centered

    def scale_fn(pos, atom_type, fc_charge, node_mask, edge_type=None, edge_mask=None):
        if centered:
            atom_type = atom_type * 2.0 - 1.0
        if pos is not None:
            pos = pos / pos_norm * node_mask
        atom_type = atom_type / atom_type_norm * node_mask
        fc_charge = fc_charge / fc_norm * node_mask
        if edge_type is not None:
            if centered:
                edge_type = edge_type * 2.0 - 1.0
            edge_type = edge_type / edge_norm
            edge_type = edge_type * edge_mask[..., None]
            return pos, atom_type, fc_charge, edge_type
        return pos, atom_type, fc_charge

    return scale_fn


def get_data_inverse_scaler(config):
    """Inverse normaliser (ref: utils.py:71-105)."""
    pos_norm, atom_type_norm, fc_norm, edge_norm = parse_normalize_factors(
        config.model.normalize_factors
    )
    centered = config.data.centered

    def inverse_fn(pos, atom_type, fc_charge, node_mask, edge_type=None, edge_mask=None):
        if pos is not None:
            pos = pos * pos_norm * node_mask
        atom_type = atom_type * atom_type_norm
        fc_charge = fc_charge * fc_norm * node_mask
        if centered:
            atom_type = (atom_type + 1.0) / 2.0 * node_mask
        if edge_type is not None:
            edge_type = edge_type * edge_norm
            if centered:
                edge_type = (edge_type + 1.0) / 2.0
            edge_type = edge_type * edge_mask[..., None]
            return pos, atom_type, fc_charge, edge_type
        return pos, atom_type, fc_charge

    return inverse_fn


def get_self_cond_fn(config):
    """Post-process self-conditioning predictions: 'ori' is identity, 'clamp'
    clips atom/fc/edge channels to the normalised value range
    (ref: utils.py:108-150)."""
    process_type = config.model.self_cond_type
    atom_types = config.data.atom_types
    include_fc = bool(config.model.include_fc_charge)
    _, atom_type_norm, fc_norm, edge_norm = parse_normalize_factors(
        config.model.normalize_factors
    )
    atom_scale = jnp.array([0.0, 1.0])
    edge_scale = jnp.array([0.0, 1.0])
    fc_scale = jnp.array(list(config.data.fc_scale))
    if config.data.centered:
        atom_scale = atom_scale * 2.0 - 1.0
        edge_scale = edge_scale * 2.0 - 1.0
    atom_scale = atom_scale / atom_type_norm
    fc_scale = fc_scale / fc_norm
    edge_scale = edge_scale / edge_norm

    def process(cond_x, cond_edge_x):
        if process_type == "ori":
            return cond_x, cond_edge_x
        if process_type == "clamp":
            atom_x = jnp.clip(
                cond_x[:, :, 3 : 3 + atom_types], atom_scale[0], atom_scale[1]
            )
            pieces = [cond_x[:, :, :3], atom_x]
            if include_fc:
                fc_x = jnp.clip(cond_x[:, :, -1:], fc_scale[0], fc_scale[1])
                pieces.append(fc_x)
            cond_x = jnp.concatenate(pieces, axis=-1)
            cond_edge_x = jnp.clip(cond_edge_x, edge_scale[0], edge_scale[1])
            return cond_x, cond_edge_x
        raise ValueError("Self-condition data process error.")

    return process
