"""Dataset base class (reference `det3d/datasets/custom.py:39-192`)."""

from .pipelines import Compose


class PointCloudDataset:
    NumPointFeatures = -1
    CLASSES = None

    def __init__(
        self,
        root_path,
        info_path,
        pipeline=None,
        test_mode=False,
        class_names=None,
        **kwargs,
    ):
        self._info_path = info_path
        self._root_path = root_path
        self._class_names = class_names
        self.test_mode = test_mode
        self._set_group_flag()
        if pipeline is None:
            self.pipeline = None
        else:
            self.pipeline = Compose(pipeline)

    def __len__(self):
        raise NotImplementedError

    def get_sensor_data(self, idx):
        raise NotImplementedError

    def __getitem__(self, idx):
        return self.get_sensor_data(idx)

    def _set_group_flag(self):
        """All-ones group flag (`custom.py:157-166`)."""
        self.flag = None

    def evaluation(self, detections, output_dir=None):
        raise NotImplementedError
