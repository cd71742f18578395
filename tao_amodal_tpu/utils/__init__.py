"""Host utilities: rendering, video IO, interpolation, fs, logging."""
