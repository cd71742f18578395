"""Native C++ host library (RLE codec, polygon region overlap)."""
