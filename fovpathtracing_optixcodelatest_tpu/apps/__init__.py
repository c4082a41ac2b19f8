"""Application layer: the CLI frame-loop driver (main.cpp twin)."""
