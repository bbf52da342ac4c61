"""Reference-shaped import surface.

Users of upstream dpwe/audfprint import `audfprint_analyze`, `hash_table`,
`audfprint_match`, `audio_read`, `stft`, `audfprint` (SURVEY §1 layer map).
These modules mirror those names and public symbols on top of the TPU-native
implementations, so existing scripts can switch with

    from audfprint_tpu.compat import audfprint_analyze, hash_table, ...
"""
