"""Engine operators (SURVEY §2) + large-scale-pipeline extensions."""
