"""ctypes bindings to the native C++ helpers (native/libnbody_native.so).

The native library is optional — every consumer has a pure-Python fallback.
Build with ``make -C native``.
"""
