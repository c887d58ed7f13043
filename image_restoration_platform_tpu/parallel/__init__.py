from .mesh import make_mesh, mesh_axes, default_mesh
from .sharding import activation_sharding, shard_params, replicate
from .pipeline import srnet_pipeline_apply
from .halo import halo_exchange_rows, spatial_shard_apply, spatial_shard_model_apply

__all__ = [
    "make_mesh",
    "mesh_axes",
    "default_mesh",
    "activation_sharding",
    "shard_params",
    "replicate",
    "halo_exchange_rows",
    "srnet_pipeline_apply",
    "spatial_shard_apply",
    "spatial_shard_model_apply",
]
