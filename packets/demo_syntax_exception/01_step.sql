SELEC broken FROM nowhere
