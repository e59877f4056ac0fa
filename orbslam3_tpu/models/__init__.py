"""SLAM state layer: frames, map pools, atlas, tracking/mapping/loop-closing drivers."""
