"""Bundle pipeline outputs into the example dict
(reference `det3d/datasets/pipelines/formating.py:10-75`)."""

from ..registry import PIPELINES


@PIPELINES.register_module
class Reformat:
    def __init__(self, **kwargs):
        self.double_flip = kwargs.get("double_flip", False)

    def __call__(self, res, info):
        meta = res["metadata"]
        points = res["lidar"]["points"]

        data_bundle = dict(metadata=meta)
        if points is not None:
            data_bundle.update(points=points)

        if res["mode"] == "train":
            data_bundle.update(res["lidar"]["targets"])
        elif res["mode"] == "val" and self.double_flip:
            # groups of 4: original, y-flip, x-flip, xy-flip
            return (
                [
                    data_bundle,
                    dict(metadata=meta, points=res["lidar"]["yflip_points"]),
                    dict(metadata=meta, points=res["lidar"]["xflip_points"]),
                    dict(metadata=meta, points=res["lidar"]["double_flip_points"]),
                ],
                info,
            )
        return data_bundle, info
