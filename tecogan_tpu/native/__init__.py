"""C++ host-loader core (tecodata.cpp): GIL-free threaded PNG decode/encode,
crop/flip, batch assembly — the TPU-native stand-in for the reference's TF
queue-runner threads (reference lib/dataloader.py:163-165,268-270).

Built on demand by tecogan_tpu.data.native_loader (g++ + libpng), or
prebuilt with `make -C tecogan_tpu/native`. This package exists so the
source ships inside wheels; the Python surface lives in data/native_loader.py.
"""
