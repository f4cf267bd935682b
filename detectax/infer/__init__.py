from detectax.infer import export, predict, serving, visualize  # noqa: F401
