"""Per-polyline map encoder (reference: modules/map_encoder.py:7-54).

PointNet-ish: MLP over (x, y, valid) road points, pooled by a single-query
multi-head attention with a learned seed, fused with a road-type embedding —
one token per polyline (<=200), plus a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.models.layers import MLPLayer, MultiHeadAttention, layer_norm

Array = jax.Array


class MapEncoder(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self, road_points: Array, road_types: Array, deterministic: bool = True
    ) -> tuple[Array, Array]:
        """road_points [B, P, L, 3], road_types [B, P, 8] ->
        (polyline tokens [B, P, H], valid mask [B, P])."""
        mc = self.cfg.model
        H = mc.hidden_dim
        dtype = jnp.dtype(mc.compute_dtype)
        B, P, L, _ = road_points.shape

        # masks (map_encoder.py:28-32): polyline valid iff any point valid;
        # fully-empty rows get point 0 force-unmasked to avoid NaN softmax.
        point_valid = road_points[..., -1] > 0.0  # [B, P, L]
        segment_valid = jnp.any(point_valid, axis=-1)  # [B, P]
        none_valid = ~segment_valid
        point_valid = point_valid.at[..., 0].set(
            jnp.where(none_valid, True, point_valid[..., 0])
        )

        pts = road_points[..., : mc.map_attr].astype(dtype)
        pts_feat = MLPLayer(H, H, dtype=dtype, name="road_pts_encoder")(pts)
        pts_feat = pts_feat.reshape(B * P, L, H)

        seed = self.param(
            "map_seeds", nn.initializers.xavier_uniform(), (1, 1, H)
        ).astype(dtype)
        seed = jnp.broadcast_to(seed, (B * P, 1, H))

        pooled = MultiHeadAttention(
            mc.num_heads, dtype, mc.dropout, d_model=H, name="road_pts_attn_layer"
        )(
            seed,
            pts_feat,
            pts_feat,
            key_padding_mask=point_valid.reshape(B * P, L),
            deterministic=deterministic,
        )  # [B*P, 1, H]
        pooled = layer_norm(dtype, "norm1")(pooled)
        pooled = pooled + MLPLayer(H, H, dtype=dtype, name="map_feats")(pooled)
        pooled = layer_norm(dtype, "norm2")(pooled)

        type_feat = MLPLayer(H, H, dtype=dtype, name="road_type_encoder")(
            road_types.astype(dtype)
        ).reshape(B * P, 1, H)
        fused = jnp.concatenate([pooled, type_feat], axis=-1)
        fused = MLPLayer(H, H, dtype=dtype, name="road_road_type_encoder")(fused)
        return fused.reshape(B, P, H), segment_valid
