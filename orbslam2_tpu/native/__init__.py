"""Native C++ runtime pieces (dataset IO / prefetching), bound via ctypes.

Built on demand with g++ (no pybind11 in the image); every entry point has
a pure-Python/PIL fallback so the package works without a toolchain.
"""

from orbslam2_tpu.native.imageio import (  # noqa: F401
    Prefetcher,
    decode_image,
    native_available,
)
