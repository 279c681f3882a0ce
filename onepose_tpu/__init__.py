"""OnePose-TPU: a TPU-native (JAX/XLA/Pallas/pjit) one-shot 6DoF object pose
estimation framework with the capabilities of zju3dv/OnePose.

Subpackages
-----------
- ``models``:   SuperPoint extractor, SuperGlue 2D-2D matcher, GATsSPG 2D-3D
                matcher, nearest-neighbour matcher — functional JAX, params as
                pytrees, static shapes, jit/pjit-ready.
- ``ops``:      on-device geometry kernels — RANSAC-EPnP, similarity RANSAC,
                multi-view triangulation, Sinkhorn OT, NMS, linear/graph
                attention, LM solver.
- ``sfm``:      the mapping pipeline (extract → covisible pairs → match →
                triangulate → postprocess) producing the 3D descriptor DB.
- ``datasets``: training/inference data pipelines with fixed-shape padding.
- ``train``:    focal loss, pjit data-parallel trainer, checkpointing.
- ``parallel``: device-mesh/sharding helpers.
- ``utils``:    host-side geometry/IO (crop/K math, COLMAP .bin IO, config).
"""

__version__ = "0.1.0"
