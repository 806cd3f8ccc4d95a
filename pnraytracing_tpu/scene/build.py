"""Scene assembly: model flattening, BVH build, light extraction.

Rebuilds the host-side pipeline of the reference:
* ``ModelOutput`` bakes each model matrix into world-space vertices with the
  inverse-transpose normal matrix (include/model.hpp:101-135);
* the BVH build reorders triangles in place (include/BVH.hpp:16-19);
* emissive triangles are scanned into a prefix-area light list
  (main.cpp:374-383);
* textures are deduplicated by name like the reference's path->id cache
  (model.hpp:57-76) and stacked into one atlas.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.bvh import BVHArrays, build_bvh, triangle_bounds
from pnraytracing_tpu.accel.layout import (
    MAX_PACKED_LEAF,
    MAX_PACKED_NODES,
    MAX_PACKED_TRIS,
    pack_traversal_data,
)
from pnraytracing_tpu.core.types import (
    BVH,
    Lights,
    Materials,
    Scene,
    TriangleMesh,
)
from pnraytracing_tpu.ops.envmap import build_envmap
from pnraytracing_tpu.ops.texture import build_atlas


@dataclasses.dataclass
class ModelEntry:
    name: str
    mesh: dict  # positions/normals/uvs/indices (numpy)
    material: dict
    transform: Optional[np.ndarray]  # 4x4 or None
    texture: Optional[np.ndarray]  # [h, w, 3] float in [0,1] or None
    texture_key: Optional[str]


class SceneBuilder:
    """Accumulates models, then flattens into one :class:`Scene` pytree."""

    def __init__(self):
        self.entries: list[ModelEntry] = []

    def add(
        self,
        mesh: dict,
        material: dict,
        name: str | None = None,
        transform: np.ndarray | None = None,
        texture: np.ndarray | None = None,
        texture_key: str | None = None,
    ) -> "SceneBuilder":
        """Register a model (the analogue of ``Model(path, modelMatrix,
        material, name)``, model.hpp:22)."""
        self.entries.append(
            ModelEntry(
                name=name or f"model{len(self.entries)}",
                mesh=mesh,
                material=dict(material),
                transform=None if transform is None else np.asarray(transform, np.float64),
                texture=texture,
                texture_key=texture_key or (name if texture is not None else None),
            )
        )
        return self

    def build(
        self,
        max_leaf_size: int = 4,
        flat_bvh: bool = False,
        env_image: np.ndarray | None = None,
        env_constant=None,
        use_native_builder: bool | None = None,
    ) -> Scene:
        """Flatten, build acceleration + light structures, assemble pytree.

        flat_bvh=True emits a single-leaf BVH (every ray tests every
        triangle) — the brute-force oracle configuration; pair it with
        ``RenderConfig(max_leaf_size=<num triangles>)``.
        """
        positions, normals, uvs = [], [], []
        indices, mat_ids, tex_ids = [], [], []
        materials: list[dict] = []
        textures: list[np.ndarray] = []
        tex_key_to_id: dict[str, int] = {}

        v_off = 0
        for e in self.entries:
            mat_id = len(materials)
            materials.append(e.material)
            tex_id = -1
            if e.texture is not None:
                key = e.texture_key
                if key not in tex_key_to_id:
                    tex_key_to_id[key] = len(textures)
                    textures.append(np.asarray(e.texture, np.float32))
                tex_id = tex_key_to_id[key]

            pos = np.asarray(e.mesh["positions"], np.float64)
            nrm = np.asarray(e.mesh["normals"], np.float64)
            tuv = np.asarray(e.mesh["uvs"], np.float32)
            idx = np.asarray(e.mesh["indices"], np.int64)
            if e.transform is not None:
                m = e.transform
                pos = pos @ m[:3, :3].T + m[:3, 3]
                # normal matrix = transpose(inverse(M)) (model.hpp:104-112)
                n_mat = np.linalg.inv(m[:3, :3]).T
                nz = np.any(nrm != 0, axis=1)
                nrm = nrm @ n_mat.T
                norms = np.linalg.norm(nrm, axis=1, keepdims=True)
                nrm = np.where(nz[:, None], nrm / np.maximum(norms, 1e-20), 0.0)

            positions.append(pos.astype(np.float32))
            normals.append(nrm.astype(np.float32))
            uvs.append(tuv)
            indices.append(idx + v_off)
            mat_ids.append(np.full(len(idx), mat_id, np.int32))
            tex_ids.append(np.full(len(idx), tex_id, np.int32))
            v_off += len(pos)

        positions = np.concatenate(positions)
        normals = np.concatenate(normals)
        uvs = np.concatenate(uvs)
        indices = np.concatenate(indices).astype(np.int32)
        mat_ids = np.concatenate(mat_ids)
        tex_ids = np.concatenate(tex_ids)

        # triangle areas (model.hpp:128: tri.area from cross product)
        p = positions[indices].astype(np.float64)
        areas = 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1
        ).astype(np.float64)

        # --- acceleration structure --------------------------------------
        if flat_bvh:
            tri_min, tri_max, _ = triangle_bounds(positions, indices)
            built = BVHArrays(
                node_min=tri_min.min(axis=0)[None],
                node_max=tri_max.max(axis=0)[None],
                axis=np.array([-1], np.int32),
                right_child=np.array([-1], np.int32),
                start=np.array([0], np.int32),
                end=np.array([len(indices)], np.int32),
                order=np.arange(len(indices), dtype=np.int32),
            )
        else:
            builder = build_bvh
            if use_native_builder is not False:
                try:
                    from pnraytracing_tpu.accel.native import (
                        build_bvh_native,
                        native_available,
                    )

                    if native_available():
                        builder = build_bvh_native
                    elif use_native_builder:
                        raise RuntimeError("native BVH builder unavailable")
                except ImportError:
                    if use_native_builder:
                        raise
            built = builder(positions, indices, max_leaf_size=max_leaf_size)

        order = built.order
        mesh = TriangleMesh(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            tangents=jnp.zeros_like(jnp.asarray(positions)),
            bitangents=jnp.zeros_like(jnp.asarray(positions)),
            uvs=jnp.asarray(uvs),
            indices=jnp.asarray(indices[order]),
            material_id=jnp.asarray(mat_ids[order]),
            texture_id=jnp.asarray(tex_ids[order]),
            area=jnp.asarray(areas[order].astype(np.float32)),
        )
        bvh = BVH(
            node_min=jnp.asarray(built.node_min),
            node_max=jnp.asarray(built.node_max),
            axis=jnp.asarray(built.axis),
            right_child=jnp.asarray(built.right_child),
            start=jnp.asarray(built.start),
            end=jnp.asarray(built.end),
        )

        # --- emissive light list (main.cpp:374-383) ----------------------
        emissive = np.stack(
            [np.asarray(m.get("emissive", (0.0, 0.0, 0.0)), np.float32) for m in materials]
        )
        is_light = np.any(emissive[mat_ids[order]] != 0.0, axis=1)
        light_idx = np.nonzero(is_light)[0].astype(np.int32)
        light_areas = areas[order][light_idx]
        prefix = np.cumsum(light_areas).astype(np.float32)
        lights = Lights(
            tri_index=jnp.asarray(light_idx),
            prefix_area=jnp.asarray(prefix),
            total_area=jnp.asarray(prefix[-1] if len(prefix) else 0.0, jnp.float32),
        )

        env = (
            build_envmap(jnp.asarray(env_image), alias=True)
            if env_image is not None else None
        )
        atlas = build_atlas(textures)

        # gather-minimized traversal layout (fits when leaves are small; the
        # flat-BVH oracle exceeds the packed count field and falls back)
        trav = None
        max_count = int((built.end - built.start)[built.right_child == -1].max())
        if (
            max_count <= MAX_PACKED_LEAF
            and len(built.start) <= MAX_PACKED_NODES
            and len(indices) <= MAX_PACKED_TRIS
        ):
            trav = pack_traversal_data(bvh, mesh)
            from pnraytracing_tpu.accel.bricks import treelet_cut_aabbs
            from pnraytracing_tpu.accel.layout import (
                pack_tri_attr16,
                pack_wide_nodes_compact,
            )

            trav = trav.replace(
                treelets=jnp.asarray(treelet_cut_aabbs(built)),
                nodes16c=jnp.asarray(pack_wide_nodes_compact(built)),
                tri_attr16=pack_tri_attr16(mesh),
            )
            if max_count <= 4:
                import os as _os

                from pnraytracing_tpu.accel.wide4 import pack_wide4

                tri9_np = positions[indices[order]].reshape(len(order), 9)
                width = int(_os.environ.get("PNRT_WIDE_WIDTH", "4"))
                trav = trav.replace(
                    w4=pack_wide4(built, tri9_np, width=width)
                )
            # scenes too large for the SMEM-resident Mosaic kernel get
            # the brick-paged streaming layout (host-built once, like
            # the reference's one-time buffer packing main.cpp:485-507)
            from pnraytracing_tpu.accel.traverse_pallas import (
                scene_fits_smem,
            )

            if not scene_fits_smem(trav, "binary"):
                from pnraytracing_tpu.accel.bricks import build_stream_data

                trav = trav.replace(stream=build_stream_data(bvh, mesh))

        return Scene(
            mesh=mesh,
            materials=Materials.stack(materials),
            bvh=bvh,
            lights=lights,
            env=env,
            textures=atlas,
            env_constant=(
                jnp.asarray(env_constant, jnp.float32)
                if env_constant is not None
                else None
            ),
            trav=trav,
            bvh_depth=built.max_depth,
        )
