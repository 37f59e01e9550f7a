"""Command-line interface: the reference's main.py / runGan.py / metrics.py
entry points rebuilt on the TPU-native stack."""
