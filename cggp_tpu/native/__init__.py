"""Native (C++/OpenMP) runtime components, loaded through ctypes.

The reference has no native code (SURVEY.md section 2); here the host-side
hot spot — cover-tree construction at N≈435k — gets a multithreaded C++
builder.  The library is compiled on first use with the system toolchain and
cached next to the sources; everything degrades gracefully to the numpy
implementation when no compiler is available.
"""

from cggp_tpu.native.build import load_library, native_available
from cggp_tpu.native.covertree_bindings import covertree_build_native

__all__ = ["load_library", "native_available", "covertree_build_native"]
