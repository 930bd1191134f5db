CREATE TABLE pk_integers(i INTEGER PRIMARY KEY);;
INSERT INTO pk_integers VALUES (1), (2), (3);;
CREATE TABLE pk_integers(i INTEGER PRIMARY KEY);;
INSERT INTO pk_integers VALUES (1), (2), (3);;
