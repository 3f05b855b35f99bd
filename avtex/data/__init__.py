"""Data pipeline: segment sampling, preprocessing, host->device prefetch."""
