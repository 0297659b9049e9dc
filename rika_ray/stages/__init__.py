"""Pipeline stages: each is a `map_batches`-shaped kernel (stateless
function or actor-pool callable class) over Arrow batches.
"""
