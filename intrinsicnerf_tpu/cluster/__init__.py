from intrinsicnerf_tpu.cluster.meanshift import estimate_bandwidth, mean_shift
from intrinsicnerf_tpu.cluster.manager import Cluster, ClusterManager, build_cluster
from intrinsicnerf_tpu.cluster.assign import (
    ClusterTable,
    empty_cluster_table,
    dest_color,
    dest_class,
    map_drgb,
    inv_map_drgb,
)
