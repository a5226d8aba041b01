"""gpusorting_tpu — a TPU-native sort execution engine.

A from-scratch JAX/Pallas re-design with the capability surface of
b0nes164/GPUSorting (LSD radix sort for keys and key-value pairs over
u32/i32/f32, ascending/descending, stable; SplitSort-style segmented sort;
test/validation/benchmark harnesses) plus a distributed multi-device layer
the reference does not have.

Quick start:
    import gpusorting_tpu as gst
    out = gst.sort(keys)                       # stable ascending
    k, v = gst.sort_pairs(keys, values)        # stable pair sort
    sorter = gst.OneSweep(gst.SortConfig(mode=gst.Mode.PAIRS))
    sorter.test_all()
"""

from .core.config import (
    Backend,
    DeviceInfo,
    EntropyPreset,
    KeyType,
    Mode,
    Order,
    PayloadType,
    RoutingParameters,
    SortConfig,
    TuningParameters,
    clear_routing_override,
    clear_tuning_overrides,
    get_device_info,
    get_routing_parameters,
    get_tuning_parameters,
    set_routing_override,
    set_tuning_override,
)
from .ops import argsort, sort, sort_batched, sort_pairs, sort_pairs_wide
from .utils.autotune import autotune, autotune_rangesweep, autotune_routing
from .api import (
    DeviceRadixSort,
    EmulatedDeadlocking,
    FFXParallelSort,
    ForwardSweep,
    GPUSorterBase,
    OneSweep,
    TestReport,
    super_test,
)
from .segsort.splitsort import (
    SegSortPlan,
    SplitSorter,
    make_segsort_fn,
    make_segsort_plan,
    split_sort_allocate_temp_memory,
    split_sort_free_temp_memory,
    split_sort_keys,
    split_sort_pairs,
    split_sort_pairs_wide,
)
from .parallel.dist_sort import (
    distributed_sort,
    distributed_sort_gather,
    make_mesh,
)

__version__ = "0.1.0"

__all__ = [
    "Backend",
    "DeviceInfo",
    "argsort",
    "autotune",
    "autotune_rangesweep",
    "autotune_routing",
    "clear_tuning_overrides",
    "set_tuning_override",
    "RoutingParameters",
    "clear_routing_override",
    "get_routing_parameters",
    "set_routing_override",
    "distributed_sort",
    "distributed_sort_gather",
    "make_mesh",
    "DeviceRadixSort",
    "EmulatedDeadlocking",
    "EntropyPreset",
    "FFXParallelSort",
    "ForwardSweep",
    "GPUSorterBase",
    "KeyType",
    "Mode",
    "OneSweep",
    "Order",
    "PayloadType",
    "SortConfig",
    "SegSortPlan",
    "SplitSorter",
    "make_segsort_fn",
    "make_segsort_plan",
    "TestReport",
    "TuningParameters",
    "get_device_info",
    "get_tuning_parameters",
    "sort",
    "sort_batched",
    "sort_pairs",
    "sort_pairs_wide",
    "split_sort_allocate_temp_memory",
    "split_sort_free_temp_memory",
    "split_sort_keys",
    "split_sort_pairs",
    "split_sort_pairs_wide",
    "super_test",
]
