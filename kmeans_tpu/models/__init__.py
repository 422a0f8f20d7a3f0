"""Model families: k-means (TPU, device-resident) and octree (CPU)."""

from kmeans_tpu.models import kmeans, octree

__all__ = ["kmeans", "octree"]
