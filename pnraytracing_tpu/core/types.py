"""Scene data model: struct-of-arrays pytrees.

The reference packs scene data into GL texel-fetch buffers with float-packing
layouts (``include/PnRT.hpp:44-49``: VERTEX_SIZE=15, MATERIAL_SIZE=18,
TRIANGLE_SIZE=6, BVHNODE_SIZE=12, LIGHT_SIZE=3).  On TPU the natural layout is
a struct-of-arrays pytree: each field is its own densely-packed jnp array, XLA
lays them out, and every field is independently differentiable (materials, env
texels and vertex positions are gradient leaves).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Materials:
    """Disney principled BRDF parameter set, one row per material.

    Field-for-field the 18-float material record of the reference
    (``include/PnRT.hpp:66-81``), as SoA arrays of shape [M] / [M, 3].
    """

    emissive: jnp.ndarray  # [M, 3]
    base_color: jnp.ndarray  # [M, 3]
    subsurface: jnp.ndarray  # [M]
    metallic: jnp.ndarray  # [M]
    specular: jnp.ndarray  # [M]
    specular_tint: jnp.ndarray  # [M]
    roughness: jnp.ndarray  # [M]
    anisotropic: jnp.ndarray  # [M]
    sheen: jnp.ndarray  # [M]
    sheen_tint: jnp.ndarray  # [M]
    clearcoat: jnp.ndarray  # [M]
    clearcoat_gloss: jnp.ndarray  # [M]
    ior: jnp.ndarray  # [M]
    transmission: jnp.ndarray  # [M]

    @property
    def count(self) -> int:
        return self.emissive.shape[0]

    @classmethod
    def stack(cls, mats: list[dict]) -> "Materials":
        """Build from a list of per-material dicts (missing keys get the
        reference defaults from PnRT.hpp:66-81)."""
        defaults = dict(
            emissive=(0.0, 0.0, 0.0),
            base_color=(0.8, 0.8, 0.8),
            subsurface=0.0,
            metallic=0.0,
            specular=0.0,
            specular_tint=0.0,
            roughness=0.5,
            anisotropic=0.0,
            sheen=0.0,
            sheen_tint=0.0,
            clearcoat=0.0,
            clearcoat_gloss=0.0,
            ior=1.0,
            transmission=0.0,
        )
        fields = {}
        for key, dval in defaults.items():
            vals = [m.get(key, dval) for m in mats]
            fields[key] = jnp.asarray(vals, dtype=jnp.float32)
        return cls(**fields)

    def gather(self, idx: jnp.ndarray) -> "Materials":
        """Per-ray material fetch (the analogue of ``GetMaterial``,
        ray_tracing.comp:122-144).

        TPU note: a field-by-field SoA fetch issues 14 separate dynamic
        gathers per call.  Instead the fields are packed into ONE [M, 18]
        matrix and selected with a one-hot f32 matmul on the MXU (exact:
        rows of a one-hot matrix sum a single addend) — zero gathers, and
        gradients flow to the fields through the matmul exactly like a
        gather's scatter-add.  Falls back to a single packed row-gather
        when the material count is large enough that the [R, M] one-hot
        would dominate."""
        import jax

        packed = jnp.concatenate(
            [
                self.emissive,
                self.base_color,
                jnp.stack(
                    [
                        self.subsurface, self.metallic, self.specular,
                        self.specular_tint, self.roughness, self.anisotropic,
                        self.sheen, self.sheen_tint, self.clearcoat,
                        self.clearcoat_gloss, self.ior, self.transmission,
                    ],
                    axis=1,
                ),
            ],
            axis=1,
        )  # [M, 18]
        m = packed.shape[0]
        if m <= 32:
            oh = jax.nn.one_hot(idx, m, dtype=jnp.float32)  # [R, M]
            rows = oh @ packed  # [R, 18] on the MXU
        else:
            rows = packed[idx]  # one gather instead of 14
        s = [rows[:, 6 + k] for k in range(12)]
        return Materials(
            emissive=rows[:, 0:3],
            base_color=rows[:, 3:6],
            subsurface=s[0], metallic=s[1], specular=s[2],
            specular_tint=s[3], roughness=s[4], anisotropic=s[5],
            sheen=s[6], sheen_tint=s[7], clearcoat=s[8],
            clearcoat_gloss=s[9], ior=s[10], transmission=s[11],
        )

    def gather_components(self, idx: jnp.ndarray):
        """Component-layout per-ray material fetch: ``(scalars, base V3,
        emissive V3)`` where ``scalars`` is a Materials whose 12 scalar
        parameters are [R] arrays (color fields are zeroed [R]
        placeholders — the V3s carry them).

        Small palettes use an M-way compare-select chain per field —
        zero gathers AND zero [R, M]/[R, 18] materializations, which the
        one-hot matmul of :meth:`gather` pays through TPU lane padding
        (BASELINE.md round 3).  Large palettes fall back to the packed
        row gather."""
        from pnraytracing_tpu.core.vec import V3, select_small

        m = self.metallic.shape[0]
        if m <= 16:
            sel = lambda t: select_small(t, idx)
            sel3 = lambda t: V3(sel(t[:, 0]), sel(t[:, 1]), sel(t[:, 2]))
            # color fields live in the returned V3s; the struct slots get
            # [R] placeholders that no component-path code reads
            zero = jnp.zeros(idx.shape, jnp.float32)
            scalars = Materials(
                emissive=zero,
                base_color=zero,
                subsurface=sel(self.subsurface),
                metallic=sel(self.metallic),
                specular=sel(self.specular),
                specular_tint=sel(self.specular_tint),
                roughness=sel(self.roughness),
                anisotropic=sel(self.anisotropic),
                sheen=sel(self.sheen),
                sheen_tint=sel(self.sheen_tint),
                clearcoat=sel(self.clearcoat),
                clearcoat_gloss=sel(self.clearcoat_gloss),
                ior=sel(self.ior),
                transmission=sel(self.transmission),
            )
            return scalars, sel3(self.base_color), sel3(self.emissive)
        g = self.gather(idx)
        return g, V3.of(g.base_color), V3.of(g.emissive)

    def sanitized(self) -> "Materials":
        """Clamp every parameter to its physical domain (the range the
        reference's ImGui sliders enforce, ImGuiLayer.hpp:60-71).  Applied
        at fetch time so out-of-range values — e.g. an unconstrained
        optimizer step pushing anisotropic past 1, where
        sqrt(1 - 0.9*aniso) goes NaN (ray_tracing.comp:826) — cannot poison
        the render; also usable as a projection step in optimizers."""
        unit = lambda a: jnp.clip(a, 0.0, 1.0)
        return self.replace(
            emissive=jnp.maximum(self.emissive, 0.0),
            base_color=jnp.clip(self.base_color, 0.0, 1.0),
            subsurface=unit(self.subsurface),
            metallic=unit(self.metallic),
            specular=unit(self.specular),
            specular_tint=unit(self.specular_tint),
            roughness=unit(self.roughness),
            anisotropic=unit(self.anisotropic),
            sheen=unit(self.sheen),
            sheen_tint=unit(self.sheen_tint),
            clearcoat=unit(self.clearcoat),
            clearcoat_gloss=unit(self.clearcoat_gloss),
            ior=jnp.maximum(self.ior, 1.0),
            transmission=unit(self.transmission),
        )


@struct.dataclass
class TriangleMesh:
    """World-space flattened geometry.

    The analogue of the reference's global ``vertices`` / ``triangles``
    vectors after ``ModelOutput`` baked model matrices in
    (``include/model.hpp:101-135``).
    """

    positions: jnp.ndarray  # [V, 3] f32
    normals: jnp.ndarray  # [V, 3] f32 (zero rows = "no vertex normal")
    tangents: jnp.ndarray  # [V, 3] f32
    bitangents: jnp.ndarray  # [V, 3] f32
    uvs: jnp.ndarray  # [V, 2] f32
    indices: jnp.ndarray  # [T, 3] i32
    material_id: jnp.ndarray  # [T] i32
    texture_id: jnp.ndarray  # [T] i32 (-1 = untextured)
    area: jnp.ndarray  # [T] f32

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    def tri_positions(self, tri_idx: jnp.ndarray):
        """Gather the three corner positions of triangles ``tri_idx``:
        returns (p0, p1, p2), each [..., 3]."""
        idx = self.indices[tri_idx]  # [..., 3]
        p = self.positions[idx]  # [..., 3, 3]
        return p[..., 0, :], p[..., 1, :], p[..., 2, :]


@struct.dataclass
class BVH:
    """Flat SAH BVH, depth-first layout.

    Same node contract as the reference (``include/BVH.hpp:6-12``,
    consumed by ray_tracing.comp:157-169): left child is implicit at
    ``id + 1``; ``right_child == -1`` marks a leaf covering triangles
    ``[start, end)``; ``axis`` is the split axis used for near-child-first
    ordering.  Triangle arrays in the owning Scene are already reordered to
    the BVH's leaf order.
    """

    node_min: jnp.ndarray  # [N, 3] f32
    node_max: jnp.ndarray  # [N, 3] f32
    axis: jnp.ndarray  # [N] i32
    right_child: jnp.ndarray  # [N] i32 (-1 = leaf)
    start: jnp.ndarray  # [N] i32
    end: jnp.ndarray  # [N] i32

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


@struct.dataclass
class Lights:
    """Emissive-triangle light list with prefix areas for O(log L)
    area-proportional selection (``include/light.hpp``, main.cpp:374-383)."""

    tri_index: jnp.ndarray  # [L] i32 indices into the (reordered) triangles
    prefix_area: jnp.ndarray  # [L] f32 inclusive prefix sum of areas
    total_area: jnp.ndarray  # [] f32

    @property
    def count(self) -> int:
        return self.tri_index.shape[0]


@struct.dataclass
class EnvMap:
    """Equirectangular HDR environment + sampling tables.

    The reference builds marginal/conditional CDFs on the CPU and bakes an
    *inverted* lookup texture (``include/shader.hpp:126-225``).  Here the CDFs
    are kept as arrays and inverted on the fly with ``searchsorted`` —
    vectorized, differentiable through the returned radiance/pdf values
    (indices are integer, hence implicitly detached).
    """

    image: jnp.ndarray  # [H, W, 3] f32 radiance
    pdf_xy: jnp.ndarray  # [W, H] f32 normalized 2-D probability mass
    cdf_marginal_x: jnp.ndarray  # [W] f32
    cdf_y_given_x: jnp.ndarray  # [W, H] f32
    # Walker alias tables (host-built at scene build, ops/envmap.py):
    # EXACTLY the CDF distribution sampled with O(1) gathers per ray —
    # the TPU analogue of the reference's pre-inverted lookup texture
    # (shader.hpp:183-203).  None during in-graph rebuilds (env texel
    # optimization), where sampling falls back to CDF bisection.
    # alias_x packs [prob, alias] per column: [W, 2]; alias_y per texel:
    # [W, H, 2].  Alias ids are stored as exact small-int floats.
    alias_x: jnp.ndarray | None = None  # [W, 2] f32
    alias_y: jnp.ndarray | None = None  # [W, H, 2] f32
    # Fat alias rows: ONE [W*H, 10] row gather resolves the whole env
    # sample — [prob, alias, rgb@(x,j) x3, rgb@(x,alias) x3, pdf@(x,j),
    # pdf@(x,alias)] — so no follow-up image/pdf gathers are needed
    # (ops/envmap.py::sample_envmap_v).  Host-baked with the alias
    # tables; None in-graph (the bisection path keeps gradients).
    alias_fat: jnp.ndarray | None = None  # [W*H, 10] f32
    # Pre-packed 2x2 bilinear quads: quad12[y, x] = texels (y,x),(y,x+1),
    # (y+1,x),(y+1,x+1) flattened — ONE row gather per bilinear fetch
    # instead of four.  Built from `image` by rolls/concats, so it is
    # differentiable and cheap to rebuild in-graph during optimization.
    quad12: jnp.ndarray | None = None  # [H, W, 12] f32

    @property
    def height(self) -> int:
        return self.image.shape[0]

    @property
    def width(self) -> int:
        return self.image.shape[1]


@struct.dataclass
class TextureAtlas:
    """Stacked 2-D base-color textures.

    The reference binds up to 20 GL samplers (main.cpp:527-554,
    ray_tracing.comp:97).  Here all textures are padded to a common
    resolution and stacked, so the fetch is one dynamic gather.
    """

    data: jnp.ndarray  # [K, H, W, 3] f32 in [0, 1]
    sizes: jnp.ndarray  # [K, 2] i32 actual (width, height) per texture
    # Mip strip (levels >= 1, box-filtered, ops/texture.py::build_atlas):
    # level l of texture k occupies rows [h_k - (h_k >> (l-1)),
    # h_k - (h_k >> l)) at width w_k >> l — total height <= H, so the
    # whole pyramid costs one extra [K, H, W, 3] array.  The reference
    # builds mipmaps + trilinear samplers (main.cpp:541-546); its
    # compute-shader texture() fetches LOD 0 (no implicit derivatives in
    # compute), so base-level-only remains the parity default and the
    # strip feeds the optional trilinear path (RenderConfig
    # .texture_lod_scale).  None when textures were built without mips.
    mips: jnp.ndarray | None = None  # [K, H, W, 3] f32

    @property
    def count(self) -> int:
        return self.data.shape[0]


@struct.dataclass
class Camera:
    """Pinhole camera basis, the analogue of ``include/camera.hpp:11-31``.

    Stores the ray-gen basis (eye, lower_left, horizontal, vertical) as
    traced arrays so interactive camera motion never triggers a re-jit.
    """

    eye: jnp.ndarray  # [3]
    lower_left: jnp.ndarray  # [3]
    horizontal: jnp.ndarray  # [3]
    vertical: jnp.ndarray  # [3]


@struct.dataclass
class Scene:
    """Everything the integrator needs, as one pytree."""

    mesh: TriangleMesh
    materials: Materials
    bvh: BVH
    lights: Lights
    env: Optional[EnvMap] = None
    textures: Optional[TextureAtlas] = None
    # Gather-minimized traversal layout (accel/layout.py); None falls back
    # to the generic traversal (e.g. the flat-BVH oracle, whose giant leaf
    # exceeds the packed count field).
    trav: Optional["object"] = None
    # Constant-radiance environment used when no HDR map is present (the
    # reference renders black on miss without an HDR; BASELINE.json config 1
    # needs a constant env light).
    env_constant: Optional[jnp.ndarray] = None  # [3]
    # Max BVH node depth (root = 1), recorded by the scene builder
    # (accel/bvh.py::flat_bvh_depth).  Static metadata: the integrator
    # rejects a RenderConfig whose stack_depth cannot hold the deepest
    # traversal path instead of silently corrupting hits (the reference's
    # equivalent contract is its fixed 128-entry stack,
    # ray_tracing.comp:431).  None = unknown (hand-built scenes).
    bvh_depth: Optional[int] = struct.field(pytree_node=False, default=None)
