"""SLAM pipeline models: frame, map state, tracking, local mapping, system."""
