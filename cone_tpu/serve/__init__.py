from cone_tpu.serve.localizer import OnlineLocalizer
