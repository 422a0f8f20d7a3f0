"""Model families: k-means (TPU, device-resident) plus the CPU palette
algorithms octree, median-cut and Wu."""

from kmeans_tpu.models import kmeans, mediancut, octree, wu

__all__ = ["kmeans", "mediancut", "octree", "wu"]
