from .ms import ms_pointers_batch, ms_lengths_batch, find_mems_batch
