"""Engine operators: dependencies, assembly, tiling, PIP, kNN, skew tools."""
