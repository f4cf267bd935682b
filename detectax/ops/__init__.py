from detectax.ops import anchors, assign, boxes, losses, nms  # noqa: F401
