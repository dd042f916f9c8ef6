"""Cross-cutting utilities: profiling, step timing, model summaries."""
