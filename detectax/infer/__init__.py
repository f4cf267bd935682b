from detectax.infer import predict, visualize  # noqa: F401
