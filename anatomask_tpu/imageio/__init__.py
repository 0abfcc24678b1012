from anatomask_tpu.imageio.base import BaseReaderWriter
from anatomask_tpu.imageio.nifti import NiftiIO
from anatomask_tpu.imageio.numpy_io import NumpyIO
from anatomask_tpu.imageio.registry import (
    determine_reader_writer_from_dataset_json,
    determine_reader_writer_from_file_ending,
    find_reader_writer_by_name,
)
