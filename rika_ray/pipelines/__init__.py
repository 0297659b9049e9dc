"""End-to-end Ray Data pipelines composed from rika_ray.stages."""
