from diffdart_tpu.collision.collide import collide_world, Contacts, max_contacts  # noqa: F401
