"""Data layer: offline preprocessing, occlusion synthesis, datasets."""
